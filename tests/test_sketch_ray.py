"""Mergeable sketches: Misra-Gries guarantees, KLL rank-error bounds."""

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.stages.sketch import (
    heavy_hitters, kll_compact, quantile_sketch)


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_heavy_hitters_exact_when_k_covers_cardinality(rd):
    rng = np.random.default_rng(3)
    vals = rng.choice([f"h{i}" for i in range(30)], 20_000,
                      p=np.linspace(1, 60, 30) / np.linspace(1, 60, 30).sum())
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = heavy_hitters(ds, "v", k=64, top=10).to_pandas()
    want = (pd.Series(vals).value_counts().rename_axis("value")
            .reset_index(name="n").sort_values(["n", "value"],
                                               ascending=[False, True]).head(10))
    assert got["value"].tolist() == want["value"].tolist()
    assert got["est_count"].tolist() == want["n"].tolist()
    # the driver-merge fast path (skew_join's detection side-channel)
    # produces the identical sketch
    drv = heavy_hitters(ds, "v", k=64, top=10, merge="driver").to_pandas()
    assert drv["value"].tolist() == got["value"].tolist()
    assert drv["est_count"].tolist() == got["est_count"].tolist()


def test_heavy_hitters_error_bound_high_cardinality(rd):
    """Zipf over 20k distinct values with k=128 counters: the true heavy
    hitters must surface and every estimate must be within n/k undercount."""
    rng = np.random.default_rng(4)
    n = 100_000
    zipf = np.minimum(rng.zipf(1.3, n), 20_000)
    ds = rd.from_pandas(pd.DataFrame({"v": zipf})).repartition(8)
    k = 128
    got = heavy_hitters(ds, "v", k=k, top=5).to_pandas()
    true = pd.Series(zipf).value_counts()
    for _, row in got.iterrows():
        t = int(true.get(row["value"], 0))
        assert row["est_count"] <= t  # MG never overcounts
        assert t - row["est_count"] <= n // k + 1
    # the single most frequent value is found
    assert got["value"].iloc[0] == true.index[0]


def test_quantile_sketch_rank_error(rd):
    rng = np.random.default_rng(5)
    vals = rng.lognormal(3, 1.5, 200_000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(16)
    got = quantile_sketch(ds, "x", [0.25, 0.5, 0.75, 0.95], m=256).to_pandas()
    sorted_vals = np.sort(vals)
    for q in (0.25, 0.5, 0.75, 0.95):
        est = got[f"q{int(q * 100)}"].iloc[0]
        rank = np.searchsorted(sorted_vals, est) / len(vals)
        assert abs(rank - q) < 0.02, (q, rank)


def test_kll_compact_deterministic_and_bounded():
    rng = np.random.default_rng(6)
    vals = rng.uniform(0, 1, 50_000)
    a = kll_compact([vals], 256)
    b = kll_compact([vals.copy()], 256)
    for la, lb in zip(a, b):
        assert (la == lb).all()
    total = sum(len(lv) for lv in a)
    assert total <= 256 * (len(a) + 1)  # O(m log(n/m)) retained


def test_grouped_quantile_sketch_skewed_key(rd):
    """A key owning 95% of rows must still produce <2.5%-rank-error
    quantiles at ANY partitioning (block layout changes which values
    co-compact, so values may differ between layouts — the error BOUND is
    the mergeability contract), and re-running the same layout is
    bit-identical (the retry guarantee)."""
    from drivers_of_global_deforestation_ray.stages.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(8)
    n = 120_000
    k = np.where(rng.uniform(size=n) < 0.95, 0, rng.integers(1, 4, n))
    v = rng.gamma(2.0, 10.0, n)
    df = pd.DataFrame({"k": k, "v": v})
    for parts in (4, 16):
        runs = []
        for _rep in range(2):
            got = grouped_quantile_sketch(rd.from_pandas(df).repartition(parts),
                                          ["k"], "v", [0.5, 0.9], m=256,
                                          num_partitions=4)
            runs.append(got.to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(runs[0], runs[1])  # same layout -> exact
        for _, row in runs[0].iterrows():
            sub = np.sort(df.loc[df["k"] == row["k"], "v"].to_numpy())
            for q in (0.5, 0.9):
                est = row[f"q{int(q * 100)}"]
                rank = np.searchsorted(sub, est) / len(sub)
                assert abs(rank - q) < 0.025, (row["k"], q, rank)


# --- Count-Min sketch -------------------------------------------------------

def test_cms_exact_when_sparse(rd):
    """Width far above cardinality -> (almost surely) no collisions: the
    estimate equals the exact count for every queried key."""
    from drivers_of_global_deforestation_ray.stages.sketch import cms_estimates

    rng = np.random.default_rng(7)
    vals = rng.integers(1, 21, 50_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = (cms_estimates(ds, "v", list(range(1, 21)), width=65536, depth=4)
           .to_pandas().set_index("key")["est"])
    true = pd.Series(vals).value_counts()
    for k in range(1, 21):
        assert got[k] == true[k]


def test_cms_overestimate_and_bound(rd):
    """Tiny width forces collisions: estimates never UNDERcount, and the
    overcount respects the e*n/width expectation bound with slack."""
    from drivers_of_global_deforestation_ray.stages.sketch import cms_estimates

    rng = np.random.default_rng(8)
    vals = rng.integers(1, 2001, 100_000)  # 2000 distinct over width 64
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    keys = list(range(1, 101))
    got = (cms_estimates(ds, "v", keys, width=64, depth=4)
           .to_pandas().set_index("key")["est"])
    true = pd.Series(vals).value_counts()
    n = len(vals)
    for k in keys:
        assert got[k] >= true.get(k, 0)          # CMS never undercounts
        assert got[k] - true.get(k, 0) <= 10 * n / 64  # loose tail bound


def test_cms_partitioning_invariant(rd):
    """The merged sketch is associative: 2 blocks and 16 blocks give the
    bit-identical estimate vector (determinism under re-sharding/retry)."""
    from drivers_of_global_deforestation_ray.stages.sketch import cms_estimates

    rng = np.random.default_rng(9)
    vals = rng.integers(1, 301, 30_000)
    df = pd.DataFrame({"v": vals})
    keys = list(range(1, 51))
    a = (cms_estimates(rd.from_pandas(df).repartition(2), "v", keys,
                       width=128, depth=4).to_pandas()
         .sort_values("key").reset_index(drop=True))
    b = (cms_estimates(rd.from_pandas(df).repartition(16), "v", keys,
                       width=128, depth=4).to_pandas()
         .sort_values("key").reset_index(drop=True))
    assert a.equals(b)


# --- bottom-k (KMV) distinct ------------------------------------------------

def test_kmv_exact_below_k_and_estimate_above(rd):
    from drivers_of_global_deforestation_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(12)
    # group "small": 10 distinct (< k -> exact); "big": 5000 distinct (~5% err)
    small = pd.DataFrame({"g": "small", "v": rng.integers(0, 10, 2000)})
    big = pd.DataFrame({"g": "big", "v": rng.integers(0, 1_000_000, 20_000)})
    nd_big = big["v"].nunique()
    ds = rd.from_pandas(pd.concat([small, big], ignore_index=True)).repartition(8)
    got = (kmv_distinct(ds, ["g"], "v", k=256).to_pandas()
           .set_index("g")["est_distinct"])
    assert got["small"] == 10.0
    assert abs(got["big"] - nd_big) / nd_big < 0.2  # 1/sqrt(256) ~ 6% expected


def test_kmv_partitioning_invariant(rd):
    from drivers_of_global_deforestation_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"g": rng.integers(0, 5, 30_000),
                       "v": rng.integers(0, 3000, 30_000)})
    a = (kmv_distinct(rd.from_pandas(df).repartition(2), ["g"], "v", k=64)
         .to_pandas().sort_values("g").reset_index(drop=True))
    b = (kmv_distinct(rd.from_pandas(df).repartition(16), ["g"], "v", k=64)
         .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --- KMV set algebra ----------------------------------------------------

def test_kmv_overlap_estimates(rd):
    from drivers_of_global_deforestation_ray.stages.sketch import kmv_overlap

    # A = 0..5999, B = 3000..8999 -> union 9000, intersection 3000
    a = pd.DataFrame({"v": np.arange(0, 6000, dtype=np.int64)})
    b = pd.DataFrame({"v": np.arange(3000, 9000, dtype=np.int64)})
    got = kmv_overlap(rd.from_pandas(a).repartition(5),
                      rd.from_pandas(b).repartition(3), "v", "v", k=512)
    eu, ei = float(got["est_union"][0]), float(got["est_intersect"][0])
    assert abs(eu - 9000) / 9000 < 0.15   # 1/sqrt(512) ~ 4.4% expected
    assert abs(ei - 3000) / 3000 < 0.25
    # small sides (< k distinct): exact
    small = kmv_overlap(rd.from_pandas(a.head(50)), rd.from_pandas(a.head(80)),
                        "v", "v", k=512)
    assert float(small["est_union"][0]) == 80.0
    assert float(small["est_intersect"][0]) == 50.0
