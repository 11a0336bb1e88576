"""From-scratch vectorized CART (regression trees, rpart-anova semantics).

The reference fits 35 ``rpart(method="anova")`` regression trees — one per
(region 1..7) x (driver 1..5) — on ~1.5k training cells over 85 features,
prunes at ``cp=0.02``, and scores every prediction-universe row
(``Supplemental_Data_1.R:312-313,328-334``).  No scikit-learn exists here, so
this is a numpy CART honoring rpart's default knobs:

- grow: ``minsplit=20``, ``minbucket=7``, ``maxdepth=30``, complexity gate
  ``cp=0.01`` (a split must reduce deviance by >= cp * SS(root));
- split criterion: anova SS reduction, evaluated at midpoints between distinct
  sorted values via cumulative sums (all candidate splits of one feature in
  one vectorized pass);
- deterministic tie-breaks: best improvement, then lowest feature index, then
  lowest threshold;
- prune: weakest-link cost-complexity pruning at ``cp`` (collapse any internal
  node whose per-split deviance improvement rate, normalized by SS(root),
  is below cp);
- predict: leaf mean (vectorized frontier walk);
- surrogate splits (rpart ch. 3.4 semantics, ``maxsurrogate=5``): at each
  primary split the best per-feature (threshold, direction) predictors of
  the primary left/right assignment are kept when they beat the
  go-with-the-majority baseline; rows missing the primary feature route by
  the first non-missing surrogate, else with the majority
  (``usesurrogate=2``).  Primary split search skips missing values
  (anova improvement over the observed subset);
- importance: per-feature sum of primary-split improvements plus surrogate
  credit (improvement x adjusted agreement), as rpart reports it.

Trees serialize to plain numpy arrays so the :class:`TreeScorer` actor pool
(`stages/score.py`) can hold all 35 via one ``ray.put``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["CartTree", "fit_cart", "prune_cart", "tree_text"]

_LEAF = -1


@dataclass
class CartTree:
    """Array-encoded binary tree.  Node 0 is the root; ``feature[i] == -1``
    marks a leaf.  ``threshold`` splits as ``x < threshold -> left``."""

    feature: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    threshold: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    left: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    right: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    value: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    n_node: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    improvement: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    root_deviance: float = 0.0
    # surrogate splits, ragged per node: node i's surrogates live at
    # [surr_offsets[i], surr_offsets[i+1]) in the flat arrays below.
    # surr_less_left[j]: x < surr_threshold[j] follows the PRIMARY's left.
    # majority_left[i]: direction for rows missing primary AND all surrogates.
    surr_offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    surr_feature: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    surr_threshold: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    surr_less_left: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))
    surr_adj: np.ndarray = field(default_factory=lambda: np.empty(0, np.float64))
    majority_left: np.ndarray = field(default_factory=lambda: np.empty(0, np.bool_))

    def _route(self, X: np.ndarray, rows: np.ndarray, nd: int) -> np.ndarray:
        """go_left for `rows` at internal node `nd`, with rpart NA routing:
        primary where observed, else first non-missing surrogate, else the
        majority direction (usesurrogate=2)."""
        xv = X[rows, self.feature[nd]]
        go_left = xv < self.threshold[nd]
        miss = np.isnan(xv)
        if miss.any():
            und = miss.copy()  # still-undecided rows
            lo, hi = (int(self.surr_offsets[nd]), int(self.surr_offsets[nd + 1])) \
                if nd + 1 < len(self.surr_offsets) else (0, 0)
            for j in range(lo, hi):
                if not und.any():
                    break
                sv = X[rows[und], self.surr_feature[j]]
                ok = ~np.isnan(sv)
                if ok.any():
                    ui = np.nonzero(und)[0][ok]
                    go_left[ui] = (sv[ok] < self.surr_threshold[j]) == bool(self.surr_less_left[j])
                    und[ui] = False
            if und.any():
                maj = bool(self.majority_left[nd]) if len(self.majority_left) else True
                go_left[und] = maj
        return go_left

    def predict(self, X: np.ndarray, has_nan: "bool | None" = None) -> np.ndarray:
        """Vectorized traversal: route the whole matrix level by level; the
        NaN-free fast path never groups by node.  Callers scoring MANY trees
        over the same matrix pass ``has_nan`` once — the isnan scan is a
        full-matrix pass that must not repeat per tree (35x in the
        flagship scorer)."""
        n = X.shape[0]
        node = np.zeros(n, dtype=np.int64)
        if has_nan is None:
            has_nan = bool(np.isnan(X).any())
        active = self.feature[node] != _LEAF
        while active.any():
            idx = np.nonzero(active)[0]
            nd = node[idx]
            if not has_nan:
                f = self.feature[nd]
                go_left = X[idx, f] < self.threshold[nd]
                node[idx] = np.where(go_left, self.left[nd], self.right[nd])
            else:
                for u in np.unique(nd):
                    rows = idx[nd == u]
                    go_left = self._route(X, rows, int(u))
                    node[rows] = np.where(go_left, self.left[u], self.right[u])
            active = self.feature[node] != _LEAF
        return self.value[node]

    def importance(self, num_features: int) -> np.ndarray:
        """Primary-split improvements plus surrogate credit
        (improvement x adjusted agreement), as rpart reports it."""
        imp = np.zeros(num_features, dtype=np.float64)
        for i in self.reachable():
            if self.feature[i] != _LEAF:
                imp[self.feature[i]] += self.improvement[i]
                if i + 1 < len(self.surr_offsets):
                    for j in range(int(self.surr_offsets[i]), int(self.surr_offsets[i + 1])):
                        imp[self.surr_feature[j]] += self.improvement[i] * self.surr_adj[j]
        return imp

    def to_arrays(self) -> dict:
        return {
            "feature": self.feature,
            "threshold": self.threshold,
            "left": self.left,
            "right": self.right,
            "value": self.value,
            "n_node": self.n_node,
            "improvement": self.improvement,
            "root_deviance": self.root_deviance,
            "surr_offsets": self.surr_offsets,
            "surr_feature": self.surr_feature,
            "surr_threshold": self.surr_threshold,
            "surr_less_left": self.surr_less_left,
            "surr_adj": self.surr_adj,
            "majority_left": self.majority_left,
        }

    @classmethod
    def from_arrays(cls, d: dict) -> "CartTree":
        return cls(**d)

    def reachable(self) -> np.ndarray:
        """Node ids reachable from the root (pruning collapses subtrees by
        marking their root a leaf; descendants stay in the arrays, dead)."""
        out, stack = [], [0]
        while stack:
            i = stack.pop()
            out.append(i)
            if self.feature[i] != _LEAF:
                stack.append(self.right[i])
                stack.append(self.left[i])
        return np.asarray(out, dtype=np.int64)

    @property
    def num_leaves(self) -> int:
        r = self.reachable()
        return int((self.feature[r] == _LEAF).sum())


def tree_text(tree: "CartTree", feature_names: "list[str]") -> "list[str]":
    """Indented text rendering of the fitted tree — the engine's
    ``plot(fit); text(fit)`` analog (``Supplemental_Data_1.R:316-318``),
    consumed by the S7 PDF report sink."""
    lines: list[str] = []

    def walk(i: int, depth: int) -> None:
        pad = "  " * depth
        if tree.feature[i] == _LEAF:
            lines.append(f"{pad}leaf value={tree.value[i]:.6f} n={int(tree.n_node[i])}")
            return
        f = feature_names[tree.feature[i]]
        lines.append(f"{pad}{f} < {tree.threshold[i]:.6f} "
                     f"(n={int(tree.n_node[i])}, gain={tree.improvement[i]:.6f})")
        walk(int(tree.left[i]), depth + 1)
        lines.append(f"{pad}{f} >= {tree.threshold[i]:.6f}")
        walk(int(tree.right[i]), depth + 1)

    walk(0, 0)
    return lines


def _best_split(
    X: np.ndarray, y: np.ndarray, minbucket: int
) -> tuple[int, float, float] | None:
    """Best (feature, threshold, improvement) for one node; None if no valid
    split.  improvement = SS(node) - SS(left) - SS(right), maximized.
    Missing values: each feature is evaluated on its OBSERVED rows only
    (rpart anova semantics); missing rows route by surrogates afterwards."""
    best_imp = 0.0
    best: tuple[int, float, float] | None = None
    any_nan = bool(np.isnan(X).any())
    for f in range(X.shape[1]):
        xv = X[:, f]
        if any_nan:
            obs = ~np.isnan(xv)
            xv, yf = xv[obs], y[obs]
        else:
            yf = y
        n = len(yf)
        if n < 2 * minbucket:
            continue
        sum_all = yf.sum()
        order = np.argsort(xv, kind="stable")
        xs = xv[order]
        ys = yf[order]
        csum = np.cumsum(ys)
        nl = np.arange(1, n, dtype=np.float64)  # left sizes after position i
        sl = csum[:-1]
        sr = sum_all - sl
        nr = n - nl
        # improvement at each cut between i and i+1
        imp = sl * sl / nl + sr * sr / nr - sum_all * sum_all / n
        valid = (xs[1:] != xs[:-1]) & (nl >= minbucket) & (nr >= minbucket)
        if not valid.any():
            continue
        imp = np.where(valid, imp, -np.inf)
        i = int(np.argmax(imp))  # argmax takes the FIRST max -> lowest threshold
        if imp[i] > best_imp + 1e-12:
            best_imp = float(imp[i])
            thr = (xs[i] + xs[i + 1]) / 2.0
            best = (f, float(thr), best_imp)
    return best


def _surrogates(
    Xn: np.ndarray, f_primary: int, thr: float, maxsurrogate: int
) -> "list[tuple[float, int, float, bool]]":
    """rpart ch. 3.4 surrogate search at one node (``Xn`` node-local rows):
    for every other feature, the (threshold, direction) that best AGREES with
    the primary left/right assignment among rows observed on both; kept only
    if it beats the go-with-the-majority baseline.  Returns up to
    ``maxsurrogate`` of (adjusted_agreement, feature, threshold, less_left),
    ordered by adjusted agreement desc (ties: feature asc, threshold asc)."""
    xp = Xn[:, f_primary]
    obs_p = ~np.isnan(xp)
    out: list[tuple[float, int, float, bool]] = []
    for f in range(Xn.shape[1]):
        if f == f_primary:
            continue
        xv = Xn[:, f]
        both = obs_p & ~np.isnan(xv)
        nb = int(both.sum())
        if nb < 2:
            continue
        lab = (Xn[both, f_primary] < thr)
        maj = max(int(lab.sum()), nb - int(lab.sum()))
        order = np.argsort(xv[both], kind="stable")
        xs = xv[both][order]
        ls = lab[order].astype(np.int64)
        cum = np.cumsum(ls)
        nl = np.arange(1, nb, dtype=np.int64)
        # cut after sorted position i: left group = xs[:i+1]
        agree_a = cum[:-1] + (nb - cum[-1]) - (nl - cum[:-1])  # x<thr -> left
        valid = xs[1:] != xs[:-1]
        if not valid.any():
            continue
        agree_b = nb - agree_a                                 # x<thr -> right
        agree_a = np.where(valid, agree_a, -1)
        agree_b = np.where(valid, agree_b, -1)
        ia, ib = int(np.argmax(agree_a)), int(np.argmax(agree_b))
        if agree_a[ia] >= agree_b[ib]:
            agree, i, less_left = int(agree_a[ia]), ia, True
        else:
            agree, i, less_left = int(agree_b[ib]), ib, False
        if agree <= maj:  # must beat "send everything with the majority"
            continue
        adj = (agree - maj) / (nb - maj)
        out.append((float(adj), f, float((xs[i] + xs[i + 1]) / 2.0), less_left))
    out.sort(key=lambda t: (-t[0], t[1], t[2]))
    return out[:maxsurrogate]


def fit_cart(
    X: np.ndarray,
    y: np.ndarray,
    minsplit: int = 20,
    minbucket: int = 7,
    cp: float = 0.01,
    maxdepth: int = 30,
    maxsurrogate: int = 5,
) -> CartTree:
    """Grow a regression tree with rpart default semantics (see module doc).
    NaN feature values are handled rpart-style: the primary split search uses
    observed rows only, missing rows route by surrogate splits (else the
    majority direction), and surrogates earn importance credit.
    ``maxsurrogate=0`` skips the surrogate search entirely."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    root_dev = float(((y - y.mean()) ** 2).sum()) if len(y) else 0.0
    feature, threshold, left, right, value, n_node, improvement = [], [], [], [], [], [], []
    node_surr: dict[int, list] = {}
    node_major: dict[int, bool] = {}

    def new_node(idx: np.ndarray) -> int:
        i = len(feature)
        feature.append(_LEAF)
        threshold.append(np.nan)
        left.append(_LEAF)
        right.append(_LEAF)
        value.append(float(y[idx].mean()) if len(idx) else 0.0)
        n_node.append(len(idx))
        improvement.append(0.0)
        return i

    # explicit stack instead of recursion (maxdepth up to 30)
    root = new_node(np.arange(len(y)))
    stack = [(root, np.arange(len(y)), 0)]
    while stack:
        node_id, idx, depth = stack.pop()
        if len(idx) < minsplit or depth >= maxdepth or root_dev <= 0:
            continue
        found = _best_split(X[idx], y[idx], minbucket)
        if found is None:
            continue
        f, thr, imp = found
        if imp < cp * root_dev:  # rpart's complexity gate on growth
            continue
        xv = X[idx, f]
        go_left = xv < thr
        miss = np.isnan(xv)
        n_l, n_r = int(go_left.sum()), int((~go_left & ~miss).sum())
        node_major[node_id] = n_l >= n_r  # ties go left (deterministic)
        surr = _surrogates(X[idx], f, thr, maxsurrogate) if maxsurrogate > 0 else []
        node_surr[node_id] = surr
        if miss.any():  # route missing rows: surrogates in order, else majority
            und = miss.copy()
            for _, sf, sthr, less_left in surr:
                if not und.any():
                    break
                sv = X[idx[und], sf]
                ok = ~np.isnan(sv)
                if ok.any():
                    ui = np.nonzero(und)[0][ok]
                    go_left[ui] = (sv[ok] < sthr) == less_left
                    und[ui] = False
            if und.any():
                go_left[und] = node_major[node_id]
        li = new_node(idx[go_left])
        ri = new_node(idx[~go_left])
        feature[node_id] = f
        threshold[node_id] = thr
        left[node_id] = li
        right[node_id] = ri
        improvement[node_id] = imp
        stack.append((ri, idx[~go_left], depth + 1))
        stack.append((li, idx[go_left], depth + 1))

    # assemble the ragged surrogate arrays in node order
    n_nodes = len(feature)
    offsets = np.zeros(n_nodes + 1, np.int64)
    s_feat: list[int] = []
    s_thr: list[float] = []
    s_ll: list[bool] = []
    s_adj: list[float] = []
    for i in range(n_nodes):
        for adj, sf, sthr, less_left in node_surr.get(i, []):
            s_feat.append(sf)
            s_thr.append(sthr)
            s_ll.append(less_left)
            s_adj.append(adj)
        offsets[i + 1] = len(s_feat)
    majority = np.asarray([node_major.get(i, True) for i in range(n_nodes)], np.bool_)

    return CartTree(
        np.asarray(feature, np.int64),
        np.asarray(threshold, np.float64),
        np.asarray(left, np.int64),
        np.asarray(right, np.int64),
        np.asarray(value, np.float64),
        np.asarray(n_node, np.int64),
        np.asarray(improvement, np.float64),
        root_dev,
        offsets,
        np.asarray(s_feat, np.int64),
        np.asarray(s_thr, np.float64),
        np.asarray(s_ll, np.bool_),
        np.asarray(s_adj, np.float64),
        majority,
    )


def prune_cart(tree: CartTree, cp: float = 0.02) -> CartTree:
    """Weakest-link cost-complexity pruning (``prune(fit, cp=0.02)``,
    ``Supplemental_Data_1.R:313``): repeatedly collapse the internal node with
    the smallest per-split deviance-improvement rate while that rate, scaled by
    SS(root), is below ``cp``."""
    if tree.root_deviance <= 0 or len(tree.feature) == 1:
        return tree
    feature = tree.feature.copy()
    left, right = tree.left.copy(), tree.right.copy()

    def subtree_stats(i: int) -> tuple[float, int]:
        """(sum of improvements, number of splits) in subtree rooted at i."""
        if feature[i] == _LEAF:
            return 0.0, 0
        gl, nl = subtree_stats(left[i])
        gr, nr = subtree_stats(right[i])
        return tree.improvement[i] + gl + gr, 1 + nl + nr

    while True:
        # only root-reachable internal nodes participate in weakest-link search
        reach, stack = [], [0]
        while stack:
            n = stack.pop()
            if feature[n] != _LEAF:
                reach.append(n)
                stack.append(right[n])
                stack.append(left[n])
        weakest, weakest_rate = -1, np.inf
        for i in reach:
            gain, nsplit = subtree_stats(i)
            rate = gain / nsplit / tree.root_deviance
            if rate < weakest_rate - 1e-15:
                weakest, weakest_rate = i, rate
        if weakest < 0 or weakest_rate >= cp:
            break
        feature[weakest] = _LEAF  # collapse the whole subtree to a leaf

    return CartTree(
        feature, tree.threshold, left, right, tree.value, tree.n_node,
        np.where(feature == _LEAF, 0.0, tree.improvement), tree.root_deviance,
        tree.surr_offsets, tree.surr_feature, tree.surr_threshold,
        tree.surr_less_left, tree.surr_adj, tree.majority_left,
    )
