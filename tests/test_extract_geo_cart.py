"""Extraction byte-identity, geocode SQL parity, STRtree/PIP, CART properties."""

import duckdb
import numpy as np
import pandas as pd

from drivers_of_global_deforestation_ray.functions import extract as X
from drivers_of_global_deforestation_ray.sources.pages import pages_table
from drivers_of_global_deforestation_ray.state import cart, geo


# --- extraction invariant (BASELINE.json.input_hint) -----------------------

def test_extract_text_byte_identity_roundtrip():
    """The pages table's text column IS extract_text(html); re-extraction must
    be byte-identical per url (the north-rule pytest invariant)."""
    t = pages_table(500, seed=42)
    texts = X.extract_text_batch(t["html"].to_pylist())
    golden = t["text"].to_pylist()
    for i, (a, b) in enumerate(zip(texts, golden)):
        assert a == b, f"row {i} text mismatch"
        assert a.encode("utf-8") == b.encode("utf-8")


def test_extract_text_handles_entities_scripts_comments():
    html = (b"<html><head><script>x<1 && y>2</script><style>a{}</style></head>"
            b"<body><!-- c --><p>A &amp; B &lt;tag&gt; &#8364; ok</p><br>line2</body></html>")
    assert X.extract_text(html) == "A & B <tag> € ok\nline2"


def test_extract_deterministic_across_calls():
    t = pages_table(50, seed=1)
    h = t["html"].to_pylist()
    assert X.extract_text_batch(h) == X.extract_text_batch(list(reversed(h)))[::-1]


# --- geocode parity with the SQL oracle formulation ------------------------

def test_geocode_matches_duckdb_md5_formula():
    urls = [f"https://example.com/p/{i}" for i in range(200)]
    lat, lon = X.geocode_urls(urls)
    con = duckdb.connect()
    df = con.execute(
        """
        SELECT ('0x' || substr(md5(u), 1, 8))::UBIGINT / 4294967296.0 * 180.0 - 90.0 AS lat,
               ('0x' || substr(md5(u), 9, 8))::UBIGINT / 4294967296.0 * 360.0 - 180.0 AS lon
        FROM (SELECT unnest(?) AS u)
        """,
        [urls],
    ).df()
    assert (df["lat"].to_numpy() == lat).all()  # bit-identical
    assert (df["lon"].to_numpy() == lon).all()


# --- STRtree / PIP ---------------------------------------------------------

def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(3)
    lo = rng.uniform(0, 100, (300, 2))
    bb = np.concatenate([lo, lo + rng.uniform(0, 8, (300, 2))], axis=1)
    tree = geo.STRtree(bb, cap=8)
    for _ in range(300):
        x, y = rng.uniform(-5, 110, 2)
        got = tree.query_point(x, y)
        want = np.nonzero((bb[:, 0] <= x) & (bb[:, 2] >= x) & (bb[:, 1] <= y) & (bb[:, 3] >= y))[0]
        assert (got == want).all()


def test_pip_matches_bruteforce_and_tiebreak():
    rng = np.random.default_rng(4)
    rings, ids = geo.make_region_polygons(7, seed=9)
    pts = np.stack([rng.uniform(-180, 180, 3000), rng.uniform(-90, 90, 3000)], axis=1)
    fast = geo.assign_regions(pts, rings, ids)
    brute = np.full(len(pts), -1, dtype=np.int64)
    for pi in np.argsort(ids):  # lowest region id wins
        m = geo.points_in_polygon(pts, rings[pi]) & (brute == -1)
        brute[m] = ids[pi]
    assert (fast == brute).all()
    assert (fast > 0).any() and (fast == -1).any()


def test_assign_regions_many_polygons_tree_path():
    """Country/ecoregion scale: >linear_threshold polygons routes through the
    batched STRtree descent; result must equal the brute-force per-polygon
    scan (lowest-id tie-break) exactly."""
    rng = np.random.default_rng(12)
    n_poly = 400
    rings, ids = [], []
    for r in range(1, n_poly + 1):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        nv = int(rng.integers(5, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(2.0, 9.0, nv)  # small, country-sized blobs
        rings.append(np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1))
        ids.append(r)
    ids = np.asarray(ids, dtype=np.int64)
    pts = np.stack([rng.uniform(-180, 180, 5000), rng.uniform(-90, 90, 5000)], axis=1)
    fast = geo.assign_regions(pts, rings, ids)  # tree path (400 > threshold)
    brute = np.full(len(pts), -1, dtype=np.int64)
    for pi in np.argsort(ids):
        m = geo.points_in_polygon(pts, rings[pi]) & (brute == -1)
        brute[m] = ids[pi]
    assert (fast == brute).all()
    assert (fast > 0).any() and (fast == -1).any()
    # prebuilt tree (the actor-pool __init__ path) gives the same answer
    tree = geo.STRtree(geo.polygon_bounds(rings))
    assert (geo.assign_regions(pts, rings, ids, tree=tree) == brute).all()


def test_pip_simple_square():
    ring = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    pts = np.asarray([[5, 5], [15, 5], [-1, -1], [9.99, 9.99]])
    got = geo.points_in_polygon(pts, ring)
    assert list(got) == [True, False, False, True]


# --- CART ------------------------------------------------------------------

def test_cart_leaf_value_is_training_mean():
    rng = np.random.default_rng(5)
    X_ = rng.uniform(0, 1, (400, 4))
    y = X_[:, 1] * 3 + rng.standard_normal(400) * 0.1
    t = cart.fit_cart(X_, y)
    pred = t.predict(X_)
    for v in np.unique(pred):
        assert abs(y[pred == v].mean() - v) < 1e-10


def test_cart_recovers_step_and_importance():
    rng = np.random.default_rng(6)
    X_ = rng.uniform(0, 1, (600, 6))
    y = (X_[:, 3] > 0.4).astype(float)
    t = cart.fit_cart(X_, y)
    assert ((t.predict(X_) - y) ** 2).mean() < 0.05
    assert t.importance(6).argmax() == 3


def test_cart_minbucket_and_constant_target():
    rng = np.random.default_rng(7)
    X_ = rng.uniform(0, 1, (100, 3))
    t = cart.fit_cart(X_, np.full(100, 2.5))
    assert t.num_leaves == 1 and t.value[0] == 2.5
    t2 = cart.fit_cart(X_[:10], rng.standard_normal(10))  # < minsplit
    assert t2.num_leaves == 1
    t3 = cart.fit_cart(X_, rng.standard_normal(100))
    assert (t3.n_node[t3.feature == -1] >= 7).all() or t3.num_leaves == 1


def test_cart_prune_reduces_and_keeps_signal():
    rng = np.random.default_rng(8)
    X_ = rng.uniform(0, 1, (800, 5))
    y = (X_[:, 0] > 0.5).astype(float) * 2 + rng.standard_normal(800) * 0.3
    grown = cart.fit_cart(X_, y, cp=0.001)
    pruned = cart.prune_cart(grown, cp=0.02)
    assert pruned.num_leaves <= grown.num_leaves
    assert pruned.num_leaves >= 2  # the real split survives
    assert ((pruned.predict(X_) - y) ** 2).mean() < 0.5


def test_cart_deterministic():
    rng = np.random.default_rng(9)
    X_ = rng.uniform(0, 1, (300, 4))
    y = rng.standard_normal(300)
    t1, t2 = cart.fit_cart(X_, y), cart.fit_cart(X_, y)
    assert (t1.feature == t2.feature).all()
    assert (t1.threshold[t1.feature != -1] == t2.threshold[t2.feature != -1]).all()


def test_cart_roundtrip_arrays():
    rng = np.random.default_rng(10)
    X_ = rng.uniform(0, 1, (200, 3))
    y = X_[:, 0] + rng.standard_normal(200) * 0.1
    t = cart.fit_cart(X_, y)
    t2 = cart.CartTree.from_arrays(t.to_arrays())
    assert (t.predict(X_) == t2.predict(X_)).all()


def test_cart_surrogate_copy_feature_and_na_routing():
    """rpart ch.3.4 (VERDICT r02 #10): a perfect-copy feature becomes the top
    surrogate (adjusted agreement 1.0); rows missing the primary route
    exactly as if it were observed."""
    rng = np.random.default_rng(7)
    n = 200
    x0 = rng.uniform(0, 1, n)
    Xm = np.column_stack([x0, x0.copy(), rng.uniform(0, 1, n)])
    y = np.where(x0 < 0.5, 1.0, 5.0) + rng.normal(0, 0.01, n)
    t = cart.fit_cart(Xm, y)
    assert t.feature[0] == 0  # tie with the copy broken to lowest index
    lo, hi = int(t.surr_offsets[0]), int(t.surr_offsets[1])
    assert hi > lo
    assert t.surr_feature[lo] == 1  # copy feature is the TOP surrogate
    assert t.surr_adj[lo] == 1.0
    assert bool(t.surr_less_left[lo])
    Xq = Xm[:40]
    want = t.predict(Xq)
    Xq_na = Xq.copy()
    Xq_na[:, 0] = np.nan
    assert np.array_equal(t.predict(Xq_na), want)


def test_cart_majority_fallback_and_surrogate_importance():
    rng = np.random.default_rng(8)
    n = 300
    x0 = rng.uniform(0, 1, n)
    Xm = np.column_stack([x0, x0.copy(), rng.uniform(0, 1, n)])
    y = np.where(x0 < 0.3, 0.0, 4.0)  # majority side: right (~70%)
    t = cart.fit_cart(Xm, y)
    out = t.predict(np.full((5, 3), np.nan))  # nothing observed anywhere
    assert (out > 2.0).all()  # usesurrogate=2: go with the majority
    imp = t.importance(3)
    assert imp[1] > 0  # surrogate credit for the never-primary copy
    assert imp[1] <= imp[0]


def test_cart_fit_routes_training_nas_by_surrogate():
    """NaN-bearing TRAINING data: the primary is chosen on observed rows and
    missing rows flow down via the surrogate, so leaf stats include them."""
    rng = np.random.default_rng(9)
    n = 400
    x0 = rng.uniform(0, 1, n)
    flip = rng.uniform(0, 1, n) < 0.05
    x1 = np.where(flip, 1.0 - x0, x0)  # 95%-faithful surrogate
    y = np.where(x0 < 0.5, 1.0, 3.0)
    x0_nan = x0.copy()
    x0_nan[::10] = np.nan  # 10% missing on the primary
    t = cart.fit_cart(np.column_stack([x0_nan, x1]), y)
    assert t.feature[0] == 0  # observed-rows improvement still beats the flip
    pred = t.predict(np.array([[np.nan, 0.2], [np.nan, 0.9]]))
    assert abs(pred[0] - 1.0) < 0.3
    assert abs(pred[1] - 3.0) < 0.3


def test_cart_no_nan_unchanged_by_surrogates():
    """With complete data, maxsurrogate=0 and the default tree must agree on
    structure and predictions (surrogates never fire)."""
    rng = np.random.default_rng(10)
    Xm = rng.uniform(0, 1, (250, 4))
    y = np.where(Xm[:, 2] < 0.4, 0.0, 2.0) + rng.normal(0, 0.05, 250)
    a = cart.fit_cart(Xm, y)
    b = cart.fit_cart(Xm, y, maxsurrogate=0)
    assert np.array_equal(a.feature, b.feature)
    assert np.array_equal(a.threshold, b.threshold, equal_nan=True)
    assert np.array_equal(a.predict(Xm), b.predict(Xm))
    assert len(b.surr_feature) == 0


def test_polygon_metrics_brute_force(ray_session):
    """q_polygon_metrics vs a per-polygon scalar reference (shoelace,
    perimeter, centroid) on the same deterministic vertex rule."""
    import math

    from drivers_of_global_deforestation_ray.pipelines.queries import (
        q_polygon_metrics)

    out = (q_polygon_metrics("/root/testdata/sf0.001").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) >= 100
    for _, row in out.head(40).iterrows():
        d = int(row["doc_id"])
        k = 4 + d % 5
        vs = [((d * 7 + j * j * 13) % 1000, (d * 11 + j * 29) % 1000)
              for j in range(k)]
        area2 = sum(x1 * y2 - x2 * y1
                    for (x1, y1), (x2, y2) in zip(vs, vs[1:] + vs[:1]))
        per = sum(math.dist(a, b) for a, b in zip(vs, vs[1:] + vs[:1]))
        assert int(row["signed_area2"]) == area2
        assert abs(row["perimeter"] - round(per, 6)) < 1e-9
        assert abs(row["centroid_x"] - round(sum(v[0] for v in vs) / k, 6)) < 1e-9
        assert int(row["n_vertices"]) == k


def test_bbox_join_blocking_completeness(ray_session):
    """bbox_join's cell blocking vs a brute-force numpy cross join on the
    same rectangle rule — every overlapping pair found exactly once."""
    from drivers_of_global_deforestation_ray.pipelines.queries import (
        q_bbox_join)

    out = (q_bbox_join("/root/testdata/sf0.001").to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    ids = np.arange(500, dtype=np.int64)
    x1 = (ids * 13) % 2000
    y1 = (ids * 29) % 2000
    x2 = x1 + 20 + ids % 80
    y2 = y1 + 20 + ids % 60
    ai, bi = np.nonzero(ids[:, None] < ids[None, :])
    hit = ((np.maximum(x1[ai], x1[bi]) <= np.minimum(x2[ai], x2[bi]))
           & (np.maximum(y1[ai], y1[bi]) <= np.minimum(y2[ai], y2[bi])))
    want = sorted(zip(ids[ai[hit]].tolist(), ids[bi[hit]].tolist()))
    got = list(zip(out["a"].tolist(), out["b"].tolist()))
    assert got == want                       # complete AND exactly-once
    assert (out["overlap_area"] > 0).all()


def test_trajectory_stats_reference(ray_session):
    """q_trajectory_stats vs a per-user pandas reference on the same
    deterministic position rule."""
    import duckdb as _dd

    from drivers_of_global_deforestation_ray.pipelines.queries import (
        q_trajectory_stats)

    out = (q_trajectory_stats("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    ev = _dd.sql("SELECT event_id, ts, user_id FROM "
                 "read_parquet('/root/testdata/sf0.001/events.parquet')"
                 ).df().sort_values(["user_id", "ts", "event_id"])
    for uid, g in list(ev.groupby("user_id"))[:20]:
        x = (g["event_id"].to_numpy() * 37) % 4096
        y = (g["event_id"].to_numpy() * 59) % 4096
        hops = np.sqrt(np.diff(x).astype(float) ** 2
                       + np.diff(y).astype(float) ** 2)
        row = out[out["user_id"] == uid].iloc[0]
        assert int(row["n_events"]) == len(g)
        assert abs(row["path_len"] - round(float(hops.sum()), 6)) < 1e-6
        net = np.sqrt(float(x[-1] - x[0]) ** 2 + float(y[-1] - y[0]) ** 2)
        assert abs(row["net_disp"] - round(net, 6)) < 1e-6
        assert int(row["bbox_area"]) == int(
            (x.max() - x.min() + 1) * (y.max() - y.min() + 1))


def test_colocation_join_brute_force(ray_session):
    """q_colocation_join vs a brute-force numpy cross check on sf0.001."""
    import duckdb as _dd

    from drivers_of_global_deforestation_ray.pipelines.queries import (
        q_colocation_join)

    out = (q_colocation_join("/root/testdata/sf0.001").to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    ev = _dd.sql(
        "SELECT event_id, epoch_us(ts) AS tsu, user_id FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')").df()
    eid = ev["event_id"].to_numpy(np.int64)
    tsu = ev["tsu"].to_numpy(np.int64)
    uid = ev["user_id"].to_numpy(np.int64)
    x = (eid * 37) % 4096
    y = (eid * 59) % 4096
    ai, bi = np.nonzero(uid[:, None] < uid[None, :])
    hit = ((np.abs(tsu[ai] - tsu[bi]) <= 3_600_000_000)
           & ((x[ai] - x[bi]) ** 2 + (y[ai] - y[bi]) ** 2 <= 128 * 128))
    want = sorted(set(zip(uid[ai[hit]].tolist(), uid[bi[hit]].tolist())))
    got = list(zip(out["a"].tolist(), out["b"].tolist()))
    assert got == want


def test_new_event_ops_partition_invariance(ray_session):
    """trajectory_stats / colocation_join / funnel_sequence produce the
    identical result at different input partitionings (the co-partition
    discipline holds regardless of block layout)."""
    from drivers_of_global_deforestation_ray.pipelines import queries as Q

    for fn in (Q.q_trajectory_stats, Q.q_colocation_join,
               Q.q_funnel_sequence):
        outs = []
        for _ in range(2):
            df = fn("/root/testdata/sf0.001").to_pandas()
            outs.append(df.sort_values(list(df.columns))
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
