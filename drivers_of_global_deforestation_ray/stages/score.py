"""Model scoring stages: per-region CART ensembles + vote/threshold gates.

The reference fits 35 rpart trees — (region 1..7) x (driver 1..5) — on the
training table, then scores every prediction-universe row with the trees of
its region (``Supplemental_Data_1.R:293-342``).  Here:

- :func:`fit_region_trees` runs driver-side (the training set is ~hundreds of
  rows — distributing the *fit* would be pure overhead; the reference agrees);
- :class:`TreeScorer` is a ``map_batches`` actor-pool callable: all trees are
  ``ray.put`` ONCE, each actor rebuilds them in ``__init__`` and scores
  batches with vectorized numpy traversal, routing rows by ``region``.  One
  pass emits all 5 driver-probability columns — replacing the reference's
  5-table merge chain (J4, ``Supplemental_Data_1.R:337``).
- :func:`vote_and_gate` applies the row-wise argmax vote (first-index
  tie-break, ``which.max`` ``:370``), the 0.5 confidence gate (``:382``) and
  the 0.005 loss gate (``:407,:496``) in one vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..state.cart import CartTree, fit_cart, prune_cart

__all__ = ["fit_region_trees", "TreeScorer", "score_with_trees", "vote_and_gate",
           "export_tree_report", "OUT_COLS"]


def export_tree_report(trees: "dict[tuple[int, int], dict]",
                       feature_names: "list[str]", path: str) -> None:
    """Render every fitted (region, driver) tree to one PDF, one page per
    tree — the reference's ``pdf(); plot(fit); text(fit)`` export
    (``Supplemental_Data_1.R:287,316-318,345``; SURVEY.md S7)."""
    from ..sources.pdf import write_text_pdf
    from ..state.cart import CartTree, tree_text

    pages = []
    for (r, d) in sorted(trees):
        t = CartTree.from_arrays(trees[(r, d)])
        pages.append((f"CART region={r} driver={d} "
                      f"(leaves={t.num_leaves})", tree_text(t, feature_names)))
    write_text_pdf(path, pages)

DRIVERS = [1, 2, 3, 4, 5]
OUT_COLS = [f"out{d}" for d in DRIVERS]


def fit_region_trees(
    training: pd.DataFrame,
    feature_names: list[str],
    regions: list[int],
    class_col: str = "training_class",
    region_col: str = "region",
    cp_grow: float = 0.01,
    cp_prune: float = 0.02,
) -> tuple[dict[tuple[int, int], dict], np.ndarray]:
    """Fit (region x driver) trees on one-hot driver labels.

    Reference semantics preserved: rows with class 7 are excluded, class 6
    stays (``Supplemental_Data_1.R:205`` — the notebook's ``<6`` delta is
    rejected per SURVEY.md §3.2); labels are the one-hot columns
    (``:195-201``); prune at cp=0.02 (``:313``).

    Returns (trees keyed by (region, driver) as plain array dicts for
    broadcast, per-feature importance summed over all trees — ST4).
    """
    training = training[training[class_col] != 7]
    X_all = training[feature_names].to_numpy(dtype=np.float64)
    importance = np.zeros(len(feature_names))
    trees: dict[tuple[int, int], dict] = {}
    for r in regions:
        mask = (training[region_col] == r).to_numpy()
        if mask.sum() < 2:
            continue
        X = X_all[mask]
        for d in DRIVERS:
            y = (training.loc[mask, class_col] == d).to_numpy(dtype=np.float64)
            tree = prune_cart(fit_cart(X, y, cp=cp_grow), cp=cp_prune)
            trees[(r, d)] = tree.to_arrays()
            importance += tree.importance(len(feature_names))
    return trees, importance


class TreeScorer:
    """Actor-pool callable: holds every (region, driver) tree; emits out1..5."""

    def __init__(self, trees_ref, feature_names: list[str], region_col: str = "region"):
        packed = ray.get(trees_ref) if isinstance(trees_ref, ray.ObjectRef) else trees_ref
        self.trees = {key: CartTree.from_arrays(arrs) for key, arrs in packed.items()}
        self.feature_names = feature_names
        self.region_col = region_col
        self.regions = sorted({r for r, _ in self.trees})

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[self.feature_names].to_numpy(dtype=np.float64)
        region = batch[self.region_col].to_numpy()
        out = np.zeros((len(batch), len(DRIVERS)))
        has_nan = bool(np.isnan(X).any())  # ONE scan for all 35 trees
        for r in self.regions:
            mask = region == r
            if not mask.any():
                continue
            Xr = X[mask]
            for j, d in enumerate(DRIVERS):
                tree = self.trees.get((r, d))
                if tree is not None:
                    out[mask, j] = tree.predict(Xr, has_nan=has_nan)
        for j, d in enumerate(DRIVERS):
            batch[f"out{d}"] = out[:, j]
        return batch


def score_with_trees(
    ds: Dataset,
    trees: dict[tuple[int, int], dict],
    feature_names: list[str],
    concurrency=(1, 8),
    batch_size: int = 65536,
) -> Dataset:
    ref = ray.put(trees)
    return ds.map_batches(
        TreeScorer,
        fn_constructor_kwargs={"trees_ref": ref, "feature_names": feature_names},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def vote_and_gate(
    ds: Dataset,
    loss_col: str = "loss",
    conf_threshold: float = 0.5,
    loss_threshold: float = 0.005,
) -> Dataset:
    """argmax vote + confidence & loss gates, one vectorized pass.

    - ``class = which.max(out1..out5)`` — numpy argmax picks the FIRST max,
      matching R (``Supplemental_Data_1.R:370``);
    - ``max_value < 0.5  -> class 0``  (strict ``<``, ``:382``);
    - ``loss < 0.005     -> class 0``  (strict ``<``, ``:407``).
    """

    def _vote(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[OUT_COLS].to_numpy()
        cls = (m.argmax(axis=1) + 1).astype(np.int64)
        mx = m.max(axis=1)
        cls = np.where(mx < conf_threshold, 0, cls)
        cls = np.where(batch[loss_col].to_numpy() < loss_threshold, 0, cls)
        batch["class"] = cls
        batch["max_value"] = mx
        return batch

    return ds.map_batches(_vote, batch_format="pandas")
