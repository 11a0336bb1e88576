"""Ray Dataset combinator semantics vs local pandas/duckdb oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from drivers_of_global_deforestation_ray.stages import relational as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_grouped_agg_matches_pandas(rd):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "k": rng.integers(0, 7, 5000),
        "v": rng.integers(0, 100, 5000).astype(np.int64),
        "f": rng.uniform(0, 1, 5000),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = R.grouped_agg(ds, ["k"], {
        "s": ("v", "sum"), "n": ("v", "size"), "mn": ("v", "min"),
        "mx": ("v", "max"), "avg": ("v", "mean"),
    }).to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(s=("v", "sum"), n=("v", "size"), mn=("v", "min"),
                               mx=("v", "max")).reset_index()
    want["avg"] = df.groupby("k")["v"].sum().to_numpy() / df.groupby("k")["v"].count().to_numpy()
    assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (got["mn"].to_numpy() == want["mn"].to_numpy()).all()
    assert (got["mx"].to_numpy() == want["mx"].to_numpy()).all()
    assert (got["avg"].to_numpy() == want["avg"].to_numpy()).all()


def test_grouped_agg_arrow_engine_bit_identical_on_int_sums(rd):
    """VERDICT r03 #6: the pyarrow.TableGroupBy partial engine must be
    BIT-IDENTICAL to the pandas kernel when summed columns are integer /
    scaled-int / integer-valued floats (associative exact sums), for
    numeric and string keys, at two partitionings."""
    rng = np.random.default_rng(3)
    n = 40_000
    df = pd.DataFrame({
        "k": rng.integers(0, 997, n),
        "sk": rng.choice(list("ABCDE"), n),
        "v": rng.integers(0, 100, n).astype(np.int64),
        "fq": rng.integers(1, 50, n).astype(np.float64),  # integer-valued
    })
    specs = {"s": ("v", "sum"), "n": ("v", "count"), "z": ("v", "size"),
             "mn": ("fq", "min"), "mx": ("fq", "max"),
             "avg": ("fq", "mean"), "fs": ("fq", "sum")}
    for keys in (["k"], ["sk"], ["sk", "k"]):
        for parts in (3, 11):
            ds = rd.from_pandas(df).repartition(parts)
            a = (R.grouped_agg(ds, keys, specs, engine="pandas")
                 .to_pandas().sort_values(keys).reset_index(drop=True))
            b = (R.grouped_agg(ds, keys, specs, engine="arrow")
                 .to_pandas().sort_values(keys).reset_index(drop=True))
            for c in a.columns:
                assert (a[c].to_numpy() == b[c].to_numpy()).all(), (keys, parts, c)


def test_grouped_transform_group_integrity(rd):
    """grouped_transform must hand each partition_fn EVERY row of each of its
    key groups (never a split group), for string and multi-column keys, at any
    num_partitions / input partitioning."""
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "ks": np.array([f"key-{i}" for i in rng.integers(0, 400, n)]),
        "ki": rng.integers(0, 7, n),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    want = df.groupby(["ks", "ki"]).agg(s=("v", "sum"), n=("v", "size")).reset_index()
    want = want.sort_values(["ks", "ki"]).reset_index(drop=True)
    for nparts, inparts in ((1, 3), (8, 16), (64, 5)):
        got = R.grouped_transform(
            rd.from_pandas(df).repartition(inparts), ["ks", "ki"],
            lambda d: d.groupby(["ks", "ki"], sort=False).agg(
                s=("v", "sum"), n=("v", "size")).reset_index(),
            num_partitions=nparts,
        ).to_pandas().sort_values(["ks", "ki"]).reset_index(drop=True)
        assert (got["ks"].to_numpy() == want["ks"].to_numpy()).all()
        assert (got["ki"].to_numpy() == want["ki"].to_numpy()).all()
        assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
        assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_asof_join_vs_pandas(rd):
    """Co-partitioned asof_join == single-frame pandas merge_asof, at any
    partitioning, including keys with no right rows (NaN payload)."""
    rng = np.random.default_rng(11)
    nl, nr = 4000, 1200
    left = pd.DataFrame({
        "eid": np.arange(nl, dtype=np.int64),
        "k": rng.integers(0, 60, nl),
        "lts": pd.to_datetime(rng.integers(0, 10**6, nl), unit="s"),
    })
    right = pd.DataFrame({
        "k2": rng.integers(0, 40, nr),  # keys 40..59 never match
        "rts": pd.to_datetime(rng.integers(0, 10**6, nr), unit="s"),
        "val": rng.integers(0, 10**6, nr).astype(np.int64),
    }).drop_duplicates(["k2", "rts"])
    got = R.asof_join(rd.from_pandas(left).repartition(7), rd.from_pandas(right).repartition(3),
                      left_ts="lts", right_ts="rts", left_by="k", right_by="k2",
                      num_partitions=8).to_pandas().sort_values("eid").reset_index(drop=True)
    lk = left.assign(__k=left["k"].astype(np.int64)).sort_values("lts", kind="stable")
    rk = right.assign(__k=right["k2"].astype(np.int64)).sort_values("rts", kind="stable")
    want = pd.merge_asof(lk, rk, left_on="lts", right_on="rts", by="__k",
                         direction="backward").sort_values("eid").reset_index(drop=True)
    assert len(got) == nl
    gv = got["val"].to_numpy(np.float64)
    wv = want["val"].to_numpy(np.float64)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()
    assert np.isnan(gv).any()  # unmatched keys exercised


def test_grouped_topk_hot_key(rd):
    """Per-key top-k with one key owning 90% of rows: the local-top-k partial
    bounds shuffle traffic and the global result equals a pandas reference."""
    rng = np.random.default_rng(23)
    n = 50_000
    k = np.where(rng.uniform(size=n) < 0.9, 0, rng.integers(1, 20, n))
    df = pd.DataFrame({"k": k, "id": np.arange(n, dtype=np.int64),
                       "v": rng.integers(0, 10**6, n).astype(np.int64)})
    got = R.grouped_topk(rd.from_pandas(df).repartition(16), ["k"], "v", k=5,
                         tie_col="id").to_pandas()
    got = got.sort_values(["k", "v", "id"], ascending=[True, False, True]).reset_index(drop=True)
    want = (df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
            .groupby("k", sort=False).head(5)
            .sort_values(["k", "v", "id"], ascending=[True, False, True]).reset_index(drop=True))
    assert (got["id"].to_numpy() == want["id"].to_numpy()).all()


def test_grouped_agg_keeps_null_keys(rd):
    """SQL groups NULL keys; pandas groupby drops them by default — the
    combinators must pass dropna=False all the way through."""
    df = pd.DataFrame({"k": [1.0, 1.0, np.nan, np.nan, 2.0],
                       "v": np.array([10, 20, 30, 40, 50], dtype=np.int64)})
    got = R.grouped_agg(rd.from_pandas(df).repartition(3), ["k"],
                        {"s": ("v", "sum"), "n": ("v", "size")}).to_pandas()
    got = got.sort_values("k", na_position="last").reset_index(drop=True)
    assert len(got) == 3  # the NaN-key group survives
    nan_row = got[got["k"].isna()]
    assert nan_row["s"].iloc[0] == 70 and nan_row["n"].iloc[0] == 2


def test_hll_approx_count_distinct(rd):
    """HLL sketch (p=12): <5% error vs exact at 10k-100k cardinalities,
    deterministic, and merge-invariant across partitionings."""
    rng = np.random.default_rng(17)
    n = 200_000
    df = pd.DataFrame({"g": rng.integers(0, 3, n),
                       "v": rng.integers(0, 60_000, n).astype(np.int64)})
    exact = df.groupby("g")["v"].nunique()
    outs = []
    for parts in (4, 19):
        got = R.approx_count_distinct(rd.from_pandas(df).repartition(parts), ["g"], "v")
        outs.append(got.to_pandas().sort_values("g").reset_index(drop=True))
    assert (outs[0]["approx_distinct"].to_numpy() == outs[1]["approx_distinct"].to_numpy()).all()
    err = np.abs(outs[0]["approx_distinct"].to_numpy() - exact.to_numpy()) / exact.to_numpy()
    assert (err < 0.05).all(), err


def test_window_ops_partitioning_invariant(rd):
    """sessionize / rolling_agg give identical output at any input
    partitioning and shuffle partition count (per-key global view holds)."""
    from drivers_of_global_deforestation_ray.stages.window import rolling_agg, sessionize

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 25, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    outs_s, outs_r = [], []
    for inparts, nparts in ((2, 4), (16, 32)):
        ds = rd.from_pandas(df).repartition(inparts)
        s = sessionize(ds, "k", "ts", "eid", gap_s=5000.0, num_partitions=nparts)
        r = rolling_agg(ds, "k", "ts", "eid", "v", window_s=5000.0, num_partitions=nparts)
        outs_s.append(s.to_pandas().sort_values("eid").reset_index(drop=True))
        outs_r.append(r.to_pandas().sort_values("eid").reset_index(drop=True))
    assert (outs_s[0]["session_idx"].to_numpy() == outs_s[1]["session_idx"].to_numpy()).all()
    assert (outs_r[0]["rolling_sum"].to_numpy() == outs_r[1]["rolling_sum"].to_numpy()).all()
    assert outs_s[0]["session_idx"].max() > 1  # gaps actually split sessions
    assert (outs_r[0]["rolling_sum"] >= df.sort_values("eid")["v"].to_numpy()).all()


def test_grouped_agg_skewed_hot_key(rd):
    """One key owns 90% of rows: two-phase partial agg must stay exact (the
    salted-shuffle remedy of SURVEY.md §4 — partials bound per-key traffic)."""
    rng = np.random.default_rng(1)
    n = 20000
    k = np.where(rng.uniform(size=n) < 0.9, 0, rng.integers(1, 50, n))
    df = pd.DataFrame({"k": k, "v": rng.integers(0, 1000, n).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(16)
    got = R.grouped_agg(ds, ["k"], {"s": ("v", "sum"), "n": ("v", "size")}).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(s=("v", "sum"), n=("v", "size")).reset_index()
    assert (got["s"].to_numpy() == want["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()


def test_salted_grouped_agg_matches_plain(rd):
    """Explicit salted hot-cell aggregation is result-invariant: identical
    to grouped_agg / pandas on a 90%-hot-key fixture, for every
    re-aggregable agg kind, at several salt counts."""
    rng = np.random.default_rng(4)
    n = 20000
    k = np.where(rng.uniform(size=n) < 0.9, 0, rng.integers(1, 40, n))
    df = pd.DataFrame({"k": k, "v": rng.integers(-500, 1000, n).astype(np.int64)})
    want = df.groupby("k").agg(s=("v", "sum"), n=("v", "size"),
                               lo=("v", "min"), hi=("v", "max")).reset_index()
    for salts in (2, 8, 32):
        ds = rd.from_pandas(df).repartition(16)
        got = R.salted_grouped_agg(
            ds, ["k"], {"s": ("v", "sum"), "n": ("v", "size"),
                        "lo": ("v", "min"), "hi": ("v", "max")},
            num_salts=salts).to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got.columns) == ["k", "s", "n", "lo", "hi"]
        assert got["n"].dtype == np.int64
        for c in ("s", "n", "lo", "hi"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (salts, c)
    # mean is not re-aggregable through a salt stage: rejected loudly
    with pytest.raises(ValueError, match="mean"):
        R.salted_grouped_agg(rd.from_pandas(df), ["k"], {"m": ("v", "mean")})


def test_grouped_agg_independent_of_partitioning(rd):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.integers(0, 5, 3000), "v": rng.integers(0, 9, 3000).astype(np.int64)})
    outs = []
    for parts in (1, 4, 13):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(R.grouped_agg(ds, ["k"], {"s": ("v", "sum")})
                    .to_pandas().sort_values("k").reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_broadcast_join_left_and_inner(rd):
    big = pd.DataFrame({"k": [1, 2, 3, 4, 2], "x": [10, 20, 30, 40, 21]})
    small = pa.table({"k": [1, 2], "name": ["a", "b"]})
    ds = rd.from_pandas(big).repartition(2)
    left = R.broadcast_join(ds, small, on="k", how="left").to_pandas().sort_values("x")
    assert len(left) == 5 and left["name"].isna().sum() == 2
    inner = R.broadcast_join(ds, small, on="k", how="inner").to_pandas()
    assert len(inner) == 3 and set(inner["name"]) == {"a", "b"}


def test_fill_null_and_one_hot(rd):
    df = pd.DataFrame({"a": [1.0, None, 3.0], "c": ["x", "y", "x"]})
    ds = rd.from_pandas(df)
    out = R.fill_null(ds, {"a": 0.0}).to_pandas()
    assert list(out["a"]) == [1.0, 0.0, 3.0]
    oh = R.one_hot(ds, "c", ["x", "y"], prefix="c_").to_pandas()
    assert list(oh["c_x"]) == [1, 0, 1] and list(oh["c_y"]) == [0, 1, 0]


def test_argmax_vote_first_index_tiebreak(rd):
    df = pd.DataFrame({"o1": [0.5, 0.2, 0.3], "o2": [0.5, 0.7, 0.3], "o3": [0.1, 0.7, 0.3]})
    out = R.argmax_vote(rd.from_pandas(df), ["o1", "o2", "o3"]).to_pandas()
    assert list(out["class"]) == [1, 2, 1]  # ties -> first column (which.max)
    assert list(out["max_value"]) == [0.5, 0.7, 0.3]


def test_dedup_exact_keeps_min_tie(rd):
    df = pd.DataFrame({"k": [1, 1, 2, 2, 2], "id": [5, 3, 9, 7, 8], "v": list("abcde")})
    out = R.dedup_exact(rd.from_pandas(df).repartition(3), ["k"], "id").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["id"]) == [3, 7]
    assert list(out["v"]) == ["b", "d"]


def test_topk_deterministic_boundary(rd):
    df = pd.DataFrame({"v": [5, 5, 5, 4, 6], "id": [3, 1, 2, 0, 4]})
    out = R.topk(rd.from_pandas(df).repartition(3), ["v", "id"], 3, [True, False]).to_pandas()
    assert list(out["id"]) == [4, 1, 2]


def test_stratified_sample_deterministic_across_partitioning(rd):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"s": rng.integers(0, 4, 1000), "id": np.arange(1000)})
    a = R.stratified_sample(rd.from_pandas(df).repartition(2), "s", 10, 7, "id").to_pandas()
    b = R.stratified_sample(rd.from_pandas(df).repartition(11), "s", 10, 7, "id").to_pandas()
    a = a.sort_values(["s", "id"]).reset_index(drop=True)
    b = b.sort_values(["s", "id"]).reset_index(drop=True)
    assert a.equals(b)
    assert (a.groupby("s").size() == 10).all()
    c = R.stratified_sample(rd.from_pandas(df), "s", 10, 8, "id").to_pandas()
    assert not a.equals(c.sort_values(["s", "id"]).reset_index(drop=True))  # seed matters


def test_add_rank_unique_keys(rd):
    rng = np.random.default_rng(4)
    keys = rng.permutation(500)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(5)
    out = R.add_rank(ds, "k", "rn").to_pandas().sort_values("k").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, 501)).all()


def test_add_rank_high_cardinality_histogram(rd):
    """The range-partitioned histogram must rank a fully-unique key column
    (the driver-killer case for the old count-table design) exactly, across
    any bucket count and block layout."""
    rng = np.random.default_rng(11)
    n = 50_000
    keys = rng.permutation(n) * 7 + 3  # unique, non-contiguous
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(16)
    out = R.add_rank(ds, "k", "rn", num_buckets=8).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, n + 1)).all()


def test_add_rank_string_keys(rd):
    """Positional split points must work for non-numeric sortable keys."""
    keys = [f"host-{i:05d}" for i in range(997)]
    rng = np.random.default_rng(3)
    ds = rd.from_pandas(pd.DataFrame({"k": rng.permutation(keys)})).repartition(4)
    out = R.add_rank(ds, "k", "rn").to_pandas().sort_values("k").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, 998)).all()


def test_semi_anti_join_broadcast_vs_shuffle(rd):
    """Both execution shapes (broadcast key-set filter / distributed marker
    join) must return identical rows, for semi and anti."""
    rng = np.random.default_rng(9)
    left = pd.DataFrame({"k": rng.integers(0, 200, 1000), "v": np.arange(1000)})
    right = pd.DataFrame({"rk": np.repeat(rng.choice(200, 60, replace=False), 5)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)
    for anti in (False, True):
        a = R.semi_join(lds, rds, "k", "rk", anti=anti, broadcast=True).to_pandas()
        b = R.semi_join(lds, rds, "k", "rk", anti=anti, broadcast=False,
                        num_partitions=4).to_pandas()
        a = a.sort_values(["k", "v"]).reset_index(drop=True)
        b = b.sort_values(["k", "v"]).reset_index(drop=True)[a.columns]
        expect = left[left["k"].isin(right["rk"]) != anti].sort_values(
            ["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, expect)
        pd.testing.assert_frame_equal(b, expect)


def test_union_and_partitioned_write(rd, tmp_path):
    df1 = pd.DataFrame({"k": [1, 2], "c": [0, 1]})
    df2 = pd.DataFrame({"k": [3, 4], "c": [0, 1]})
    u = R.union_all([rd.from_pandas(df1), rd.from_pandas(df2)])
    assert u.count() == 4
    R.partitioned_write(u, str(tmp_path / "out"), "c")
    import pyarrow.dataset as pads

    back = pads.dataset(str(tmp_path / "out"), partitioning="hive").to_table().to_pandas()
    assert len(back) == 4 and set(back["c"].astype(int)) == {0, 1}


def test_hash_join_vs_pandas(rd):
    rng = np.random.default_rng(5)
    left = pd.DataFrame({"k": rng.integers(0, 100, 800), "a": np.arange(800)})
    right = pd.DataFrame({"k2": rng.integers(0, 100, 600), "b": np.arange(600)})
    got = R.hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", right_on="k2", how="inner", num_partitions=4).to_pandas()
    want = left.merge(right, left_on="k", right_on="k2")
    assert len(got) == len(want)
    assert got["a"].sum() == want["a"].sum() and got["b"].sum() == want["b"].sum()


def test_rolling_minmax_vs_bruteforce(rd):
    """Sparse-table RMQ trailing min/max must equal the O(n^2) brute force,
    incl. equal-timestamp peers on both window edges."""
    from drivers_of_global_deforestation_ray.stages.window import rolling_agg

    rng = np.random.default_rng(2)
    n = 800
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 5, n),
        "ts": pd.to_datetime(rng.integers(0, 3000, n).cumsum() % 100_000, unit="s"),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(4)
    for agg in ("min", "max", "mean", "count"):
        got = rolling_agg(ds, "k", "ts", "id", "v", window_s=900.0, agg=agg,
                          num_partitions=4).to_pandas().sort_values("id")
        brute = []
        for _, row in df.iterrows():
            m = (df["k"] == row["k"]) & (df["ts"] >= row["ts"] - pd.Timedelta(seconds=900)) \
                & (df["ts"] <= row["ts"])
            vs = df.loc[m, "v"]
            brute.append({"min": vs.min(), "max": vs.max(),
                          "mean": vs.mean(), "count": len(vs)}[agg])
        got_v = got[f"rolling_{agg}"].to_numpy()
        assert np.allclose(got_v.astype(np.float64), np.asarray(brute, dtype=np.float64))


def test_range_join_copartitioned_vs_broadcast(rd):
    """Banded co-partitioned interval join == broadcast range_join on random
    points x intervals, across band widths (incl. intervals spanning many
    bands and negative values)."""
    rng = np.random.default_rng(31)
    pts = pd.DataFrame({"pid": np.arange(3000, dtype=np.int64),
                        "v": rng.uniform(-500, 500, 3000)})
    lo = rng.uniform(-500, 450, 40)
    iv = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(0, 200, 40),
                       "ivid": np.arange(40, dtype=np.int64)})
    want = R.range_join(rd.from_pandas(pts).repartition(4), iv,
                        left_val="v", lo_col="lo", hi_col="hi").to_pandas()
    want = want.sort_values(["pid", "ivid"]).reset_index(drop=True)
    for bw in (37.0, 250.0):
        got = R.range_join_copartitioned(
            rd.from_pandas(pts).repartition(4), rd.from_pandas(iv).repartition(3),
            left_val="v", lo_col="lo", hi_col="hi", band_width=bw,
            num_partitions=4).to_pandas()
        got = got.sort_values(["pid", "ivid"]).reset_index(drop=True)
        assert (got["pid"].to_numpy() == want["pid"].to_numpy()).all()
        assert (got["ivid"].to_numpy() == want["ivid"].to_numpy()).all()


def test_rolling_rows_vs_bruteforce(rd):
    """ROWS-frame trailing sum == O(n^2) brute force over (ts, id) order."""
    from drivers_of_global_deforestation_ray.stages.window import rolling_rows

    rng = np.random.default_rng(6)
    n = 600
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 4, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "v": rng.integers(-9, 9, n).astype(np.int64),
    })
    got = rolling_rows(rd.from_pandas(df).repartition(3), "k", "ts", "id", "v",
                       preceding=3, num_partitions=4).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    s = df.sort_values(["k", "ts", "id"], kind="stable").reset_index(drop=True)
    brute = {}
    for kv, g in s.groupby("k", sort=False):
        vals = g["v"].to_numpy()
        for i, rid in enumerate(g["id"].to_numpy()):
            brute[rid] = vals[max(0, i - 3):i + 1].sum()
    assert (got["rows_sum"].to_numpy()
            == np.asarray([brute[i] for i in got["id"]])).all()


def test_semi_join_bloom_prefilter_exact(rd):
    """The Bloom-prefiltered shuffle semi join must return exactly the
    broadcast result (no false negatives -> exact after the join), and the
    prefilter must actually drop most non-matching rows."""
    rng = np.random.default_rng(14)
    left = pd.DataFrame({"k": rng.integers(0, 100_000, 20_000),
                         "v": np.arange(20_000)})
    right = pd.DataFrame({"rk": rng.choice(100_000, 500, replace=False)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    exact = R.semi_join(lds, rds, "k", "rk").to_pandas()
    bloomed = R.semi_join(lds, rds, "k", "rk", broadcast=False,
                          num_partitions=4, bloom_bits=1 << 16).to_pandas()
    key = lambda df: sorted(zip(df["k"], df["v"]))
    assert key(exact) == key(bloomed)
    # prefilter selectivity: bloom keeps matches + ~fp-rate of the rest
    bits = R.build_bloom(rd.from_pandas(right), "rk", num_bits=1 << 16)
    kept = R.bloom_contains(bits, left["k"]).mean()
    truth = left["k"].isin(right["rk"]).mean()
    assert kept < truth + 0.05  # fp rate well under 5% at 131 bits/key


def test_semi_join_bloom_mixed_dtype_kinds(rd):
    """ADVICE r02: an int64 build side probed by a float64 left column (and
    vice versa) must keep every matching row — hash_pandas_object hashes the
    two kinds differently, so without canonicalization the bloom path
    silently drops ALL matches."""
    rng = np.random.default_rng(7)
    keys = rng.choice(10_000, 300, replace=False)
    left = pd.DataFrame({"k": rng.integers(0, 10_000, 5_000).astype(np.float64),
                         "v": np.arange(5_000)})
    right = pd.DataFrame({"rk": keys.astype(np.int64)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    bloomed = R.semi_join(lds, rds, "k", "rk", broadcast=False,
                          num_partitions=4, bloom_bits=1 << 16).to_pandas()
    expect = left[left["k"].isin(keys)]
    assert sorted(zip(bloomed["k"], bloomed["v"])) == sorted(zip(expect["k"], expect["v"]))
    assert len(expect) > 0
    # and the flipped orientation: float build side, int probe side
    bits = R.build_bloom(rd.from_pandas(pd.DataFrame({"rk": keys.astype(np.float64)})),
                         "rk", num_bits=1 << 16)
    probe = pd.Series(keys.astype(np.int64))
    assert R.bloom_contains(bits, probe).all()


def test_hopping_window_counts(rd):
    """Each event lands in exactly ceil(size/step) windows; per-window counts
    match a brute-force enumeration."""
    import pandas as pd

    from drivers_of_global_deforestation_ray.stages.window import hopping_window

    rng = np.random.default_rng(3)
    n = 500
    ts_s = np.sort(rng.integers(0, 5000, n))
    df = pd.DataFrame({"ts": pd.to_datetime(ts_s * 1_000_000, unit="us"),
                       "value": np.round(rng.uniform(0, 10, n), 2)})
    out = hopping_window(rd.from_pandas(df).repartition(4), "ts", "value",
                         size_s=300, step_s=100, num_partitions=2).to_pandas()
    # brute force
    import collections
    cnt = collections.Counter()
    sums = collections.Counter()
    for t, v in zip(ts_s, np.round(df["value"].to_numpy() * 100).astype(np.int64)):
        w = (t // 100) * 100
        for k in range(3):
            if w - k * 100 > t - 300:
                cnt[w - k * 100] += 1
                sums[w - k * 100] += v
    out = out.sort_values("window_start").reset_index(drop=True)
    assert out["window_start"].tolist() == sorted(cnt)
    assert out["n_events"].tolist() == [cnt[w] for w in sorted(cnt)]
    assert out["sum_value_scaled"].tolist() == [sums[w] for w in sorted(cnt)]
    assert out["n_events"].sum() == 3 * n  # every event in exactly 3 windows


def test_copart_join_matches_dataset_join(rd):
    """Task-based co-partition equi-join: identical output to Dataset.join
    for inner and left, including typed-null left-join payloads."""
    import pandas as pd

    from drivers_of_global_deforestation_ray.stages.relational import copart_join, hash_join

    rng = np.random.default_rng(4)
    left = pd.DataFrame({"k": rng.integers(0, 50, 200).astype(np.int64),
                         "lv": np.arange(200, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 40, dtype=np.int64),
                          "rv": rng.uniform(0, 1, 40)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    for how in ("inner", "left"):
        a = copart_join(lds, rds, on="k", right_on="rk", how=how,
                        num_partitions=3).to_pandas()
        b = hash_join(lds, rds, on="k", right_on="rk", how=how,
                      num_partitions=2).to_pandas()
        key = ["k", "lv"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        assert a["k"].tolist() == b["k"].tolist()
        assert a["lv"].tolist() == b["lv"].tolist()
        # matched payloads agree; unmatched are null on both engines
        av = a["rv"].to_numpy(dtype=np.float64, na_value=np.nan)
        bv = b["rv"].to_numpy(dtype=np.float64, na_value=np.nan)
        assert np.array_equal(np.isnan(av), np.isnan(bv))
        assert np.allclose(av[~np.isnan(av)], bv[~np.isnan(bv)])
        if how == "inner":  # plain dtypes for the comparator
            assert a["k"].dtype == np.int64 and a["lv"].dtype == np.int64


def test_rollup_agg_vs_pandas(rd):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 4000),
        "b": rng.choice(["p", "q"], 4000),
        "v": rng.integers(0, 100, 4000).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = R.rollup_agg(ds, ["a", "b"], {
        "n": ("v", "size"), "s": ("v", "sum"), "mx": ("v", "max"),
    }).to_pandas()
    fine = got[got["b"].notna()]
    mid = got[got["b"].isna() & got["a"].notna()]
    total = got[got["a"].isna()]
    want_fine = df.groupby(["a", "b"]).agg(n=("v", "size"), s=("v", "sum"),
                                           mx=("v", "max")).reset_index()
    m = fine.sort_values(["a", "b"]).reset_index(drop=True)
    w = want_fine.sort_values(["a", "b"]).reset_index(drop=True)
    assert (m[["n", "s", "mx"]].to_numpy() == w[["n", "s", "mx"]].to_numpy()).all()
    want_mid = df.groupby("a").agg(n=("v", "size"), s=("v", "sum"),
                                   mx=("v", "max")).reset_index()
    m2 = mid.sort_values("a").reset_index(drop=True)
    assert (m2[["n", "s", "mx"]].to_numpy()
            == want_mid.sort_values("a")[["n", "s", "mx"]].to_numpy()).all()
    assert len(total) == 1
    assert total["n"].iloc[0] == 4000 and total["s"].iloc[0] == df["v"].sum()
    assert got["n"].dtype.kind == "i"  # counts stay int64 through the union
    with pytest.raises(ValueError):
        R.rollup_agg(ds, ["a"], {"avg": ("v", "mean")})


def test_pii_scrub_and_nfc(rd):
    from drivers_of_global_deforestation_ray.stages.textstage import (
        nfc_normalize, pii_scrub)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at a.b@x.io or c@y.org from 10.0.0.1",
            "call +1-555-12345 plain text 999",
            "nothing here",
        ],
    })
    got = pii_scrub(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert got["n_email"].tolist() == [2, 0, 0]
    assert got["n_ip"].tolist() == [1, 0, 0]
    assert got["n_phone"].tolist() == [0, 1, 0]
    assert got["red_text"].iloc[0] == "mail me at <EMAIL> or <EMAIL> from <IP>"
    assert got["red_text"].iloc[1] == "call <PHONE> plain text 999"
    assert got["red_text"].iloc[2] == "nothing here"

    df2 = pd.DataFrame({"doc_id": [1], "text": ["café Jürgen"]})
    norm = nfc_normalize(rd.from_pandas(df2)).to_pandas()
    assert norm["norm_text"].iloc[0] == "café Jürgen"
    assert norm["n_raw"].iloc[0] == 13 and norm["n_norm"].iloc[0] == 11


def test_weighted_sample_topk(rd):
    """A-Res weighted sampling: matches a direct numpy transcription,
    is partitioning-invariant, favors heavy weights, excludes w<=0 while
    positive rows remain."""
    import hashlib

    rng = np.random.default_rng(29)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 10 == 0, 100.0, 1.0)  # 10% of rows carry 100x weight
    w[:5] = 0.0                              # a few zero-weight rows
    df = pd.DataFrame({"id": ids, "w": w})

    u = np.array([int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                  for v in ids], dtype=np.float64)
    u = (u + 0.5) / 4294967296.0
    key = np.where(w > 0, np.power(u, 1.0 / np.where(w > 0, w, 1.0)), 0.0)
    order = np.lexsort((ids, -key))
    want = set(ids[order[:300]].tolist())

    outs = []
    for parts in (1, 6):
        got = (R.weighted_sample_topk(rd.from_pandas(df).repartition(parts),
                                      k=300, id_col="id", weight_col="w")
               .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(got)
        assert set(got["id"]) == want
        assert list(got.columns) == ["id", "w"]  # key column dropped
    assert outs[0].equals(outs[1])
    sel = outs[0]
    heavy_rate = (sel["id"] % 10 == 0).mean()
    assert heavy_rate > 0.8        # 100x weights dominate the sample
    assert not set(sel["id"]) & set(range(5))  # zero-weight rows excluded


def test_grouped_sample_topk_deterministic_and_exact(rd):
    """Per-key md5-order sample: matches a direct numpy transcription,
    identical at different partitionings, clamps to group size."""
    import hashlib

    from drivers_of_global_deforestation_ray.stages.relational import grouped_sample_topk

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "id": np.arange(300, dtype=np.int64),
        "grp": rng.choice(["a", "b", "c", "tiny"], p=[0.45, 0.45, 0.09, 0.01], size=300),
    })

    def u32(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    want = (df.assign(u=[u32(v) for v in df["id"]])
              .sort_values(["u", "id"]).groupby("grp").head(5))
    want_set = set(zip(want["grp"], want["id"]))
    for parts in (2, 8):
        out = grouped_sample_topk(rd.from_pandas(df).repartition(parts),
                                  ["grp"], k=5, id_col="id",
                                  num_partitions=4).to_pandas()
        assert set(zip(out["grp"], out["id"])) == want_set
    sizes = out.groupby("grp").size()
    assert sizes.max() == 5 and sizes["tiny"] == min(5, (df["grp"] == "tiny").sum())


# --- skew-aware hybrid join ---------------------------------------------

def test_skew_join_hot_key_parity(rd):
    """95%-hot-key fixture: skew_join must equal hash_join exactly — the
    hot/cold routing is invisible in the result."""
    from drivers_of_global_deforestation_ray.stages.relational import (
        hash_join, skew_join)

    rng = np.random.default_rng(21)
    n = 40_000
    keys = np.where(rng.random(n) < 0.95, 7,
                    rng.integers(0, 500, n))  # one viral key
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 500, dtype=np.int64),
                          "rv": np.arange(0, 500, dtype=np.int64) * 10})
    lds = rd.from_pandas(left).repartition(8)
    rds = rd.from_pandas(right).repartition(4)
    got = (skew_join(lds, rds, on="k", right_on="rk", hot_k=8,
                     num_partitions=4)
           .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    want = (hash_join(rd.from_pandas(left).repartition(8),
                      rd.from_pandas(right).repartition(4),
                      on="k", right_on="rk", how="inner", num_partitions=4)
            .to_pandas()[got.columns]
            .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert (got["k"] == 7).sum() > 0.9 * n  # the hot key really joined


def test_skew_join_rejects_outer(rd):
    from drivers_of_global_deforestation_ray.stages.relational import skew_join

    ds = rd.range(10)
    with pytest.raises(ValueError):
        skew_join(ds, ds, on="id", how="full")


def test_skew_join_left_keeps_unmatched(rd):
    """LEFT skew join: rows whose key misses the right side survive with
    nulls, on both the hot and cold paths."""
    from drivers_of_global_deforestation_ray.stages.relational import (
        hash_join, skew_join)

    rng = np.random.default_rng(23)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, 3, rng.integers(0, 100, n))
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 50, dtype=np.int64),
                          "rv": np.arange(0, 50, dtype=np.int64) * 10})
    got = (skew_join(rd.from_pandas(left).repartition(6),
                     rd.from_pandas(right).repartition(2),
                     on="k", right_on="rk", how="left", hot_k=4,
                     num_partitions=4)
           .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    want = (hash_join(rd.from_pandas(left).repartition(6),
                      rd.from_pandas(right).repartition(2),
                      on="k", right_on="rk", how="left", num_partitions=4)
            .to_pandas()[got.columns]
            .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert got["rv"].isna().sum() > 0  # unmatched keys (>= 50) survived


def test_skew_join_hot_keys_absent_from_right(rd):
    """Hot keys with ZERO matching right rows (ordinary for left joins /
    non-covering dimension tables): the hot-right collection must keep a
    typed schema even when empty, and the left join must keep the hot rows
    with nulls.  Regression: empty to_pandas() lost the schema and the
    broadcast path raised on the missing right key column."""
    from drivers_of_global_deforestation_ray.stages.relational import (
        hash_join, skew_join)

    rng = np.random.default_rng(31)
    n = 10_000
    # the viral key is 999 — NOT present in right (right covers 0..49)
    keys = np.where(rng.random(n) < 0.9, 999, rng.integers(0, 100, n))
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 50, dtype=np.int64),
                          "rv": np.arange(0, 50, dtype=np.int64) * 10})
    for how in ("left", "inner"):
        got = (skew_join(rd.from_pandas(left).repartition(6),
                         rd.from_pandas(right).repartition(2),
                         on="k", right_on="rk", how=how, hot_k=4,
                         num_partitions=4)
               .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
        want = (hash_join(rd.from_pandas(left).repartition(6),
                          rd.from_pandas(right).repartition(2),
                          on="k", right_on="rk", how=how, num_partitions=4)
                .to_pandas()[got.columns]
                .sort_values(["k", "lv"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        hot_rows = (got["k"] == 999).sum()
        if how == "left":
            assert hot_rows > 0.8 * n and got.loc[got["k"] == 999, "rv"].isna().all()
        else:
            assert hot_rows == 0  # inner drops the orphan hot key


def test_running_total_partitioning_invariant(rd):
    """Distributed prefix sum == numpy cumsum over the sorted order, at two
    partitionings, including heavy key ties (all ties share a bucket)."""
    from drivers_of_global_deforestation_ray.stages.relational import running_total

    rng = np.random.default_rng(29)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.integers(0, 500, n),       # heavy ties
        "tie": np.arange(n, dtype=np.int64),
        "v": rng.integers(-100, 100, n),
    })
    want = df.sort_values(["k", "tie"], kind="stable")
    want_cs = want["v"].to_numpy().cumsum()
    want_map = dict(zip(want["tie"].to_numpy(), want_cs))
    for parts in (2, 16):
        got = (running_total(rd.from_pandas(df).repartition(parts),
                             "k", "tie", "v").to_pandas())
        got_map = dict(zip(got["tie"].to_numpy(),
                           got["running_sum"].to_numpy()))
        assert got_map == want_map


def test_running_max_matches_pandas_and_partitioning(rd):
    from drivers_of_global_deforestation_ray.stages.relational import running_max

    rng = np.random.default_rng(11)
    n = 5000
    key = rng.permutation(n).astype(np.int64)          # unique arrival order
    val = rng.integers(-1000, 1000, n).astype(np.int64)
    df = pd.DataFrame({"k": key, "i": np.arange(n, dtype=np.int64), "v": val})
    want = df.sort_values(["k", "i"]).assign(
        rm=lambda d: d["v"].cummax())
    for parts in (1, 7):
        got = running_max(rd.from_pandas(df).repartition(parts), "k", "i",
                          "v", out_col="rm").to_pandas().sort_values(["k", "i"])
        np.testing.assert_array_equal(got["rm"].to_numpy(),
                                      want["rm"].to_numpy())


def test_tumbling_window_late_watermark_semantics(rd):
    """Hand-built case: an event arriving after its window's watermark
    closure is dropped; on-time and late-but-within-lateness are kept."""
    from drivers_of_global_deforestation_ray.stages.window import (
        tumbling_window_late)

    # window size 10, lateness 5.  Event d (t=3, window [0,10)) arrives
    # after an event with t=18 has arrived -> wm=13 >= 10: DROPPED.
    # Event c (t=8) arrives while wm=18-5=13 >= 10 too?  give it arr before
    # the t=18 arrival -> wm=8-5=3 < 10: kept.
    df = pd.DataFrame({
        "id": np.arange(5, dtype=np.int64),
        "t":   np.array([1, 8, 18, 3, 25], dtype=np.int64),
        "arr": np.array([1, 9, 20, 30, 40], dtype=np.int64),
    })
    out = tumbling_window_late(rd.from_pandas(df).repartition(2), "t", "arr",
                               "id", size_s=10, allowed_lateness_s=5,
                               num_partitions=2).to_pandas()
    got = {int(r.window_start): (int(r.n_accepted), int(r.n_dropped))
           for r in out.itertuples()}
    # window 0: t=1 (on time), t=8 (wm 3 < 10, kept), t=3 (arr after t=18
    # seen: wm 13 >= 10, dropped)
    assert got[0] == (2, 1)
    assert got[10] == (1, 0)
    assert got[20] == (1, 0)


def _mk_bucketed(rd, tmp, name, df, key, nb=8):
    import os

    from drivers_of_global_deforestation_ray.stages.bucketed import write_bucketed

    p = os.path.join(tmp, name)
    write_bucketed(rd.from_pandas(df).repartition(3), p, key, num_buckets=nb)
    return p


def test_bucketed_join_matches_hash_join(rd, tmp_path):
    from drivers_of_global_deforestation_ray.stages.bucketed import bucketed_join

    rng = np.random.default_rng(2)
    left = pd.DataFrame({"k": rng.integers(0, 60, 200).astype(np.int64),
                         "lv": np.arange(200, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(0, 80, 2, dtype=np.int64),
                          "rv": np.arange(40, dtype=np.int64) * 10})
    lp = _mk_bucketed(rd, str(tmp_path), "l", left, "k")
    rp = _mk_bucketed(rd, str(tmp_path), "r", right, "rk")
    got = bucketed_join(lp, rp, how="inner").to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    key_cols = ["k", "lv", "rv"]
    got_s = got[key_cols].sort_values(key_cols).reset_index(drop=True)
    want_s = want[key_cols].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s)
    # left join: unmatched keys survive with null right values
    gl = bucketed_join(lp, rp, how="left").to_pandas()
    assert len(gl) == len(left.merge(right, left_on="k", right_on="rk",
                                     how="left"))
    odd = gl[gl["k"] % 2 == 1]
    assert len(odd) and odd["rv"].isna().all()


def test_bucketed_join_guards(rd, tmp_path):
    from drivers_of_global_deforestation_ray.stages.bucketed import bucketed_join

    l = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                      "v": np.arange(10, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                      "v": np.arange(10, dtype=np.int64)})
    lp = _mk_bucketed(rd, str(tmp_path), "a", l, "k", nb=8)
    rp = _mk_bucketed(rd, str(tmp_path), "b", r, "k", nb=4)
    with pytest.raises(ValueError, match="bucketing mismatch"):
        bucketed_join(lp, rp)
    rp2 = _mk_bucketed(rd, str(tmp_path), "c", r, "k", nb=8)
    with pytest.raises(Exception, match="collision"):
        bucketed_join(lp, rp2).to_pandas()
    with pytest.raises(ValueError, match="how"):
        bucketed_join(lp, rp2, how="full")


def test_bucketed_agg_matches_pandas_and_guards(rd, tmp_path):
    from drivers_of_global_deforestation_ray.stages.bucketed import bucketed_agg

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": rng.integers(0, 30, 300).astype(np.int64),
                       "v": rng.integers(0, 100, 300).astype(np.int64)})
    p = _mk_bucketed(rd, str(tmp_path), "agg", df, "k")
    got = bucketed_agg(p, ["k"], {"n": ("v", "size"), "s": ("v", "sum"),
                                  "mx": ("v", "max")}).to_pandas()
    want = (df.groupby("k").agg(n=("v", "size"), s=("v", "sum"),
                                mx=("v", "max")).reset_index())
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"n": np.int64}), want)
    with pytest.raises(ValueError, match="bucket key"):
        bucketed_agg(p, ["v"], {"n": ("k", "size")})


def test_bucketed_oversize_split_and_guards(rd, tmp_path):
    """Sizing contract: an oversize LEFT bucket is split into part-file
    groups (answer unchanged); an oversize RIGHT/agg bucket raises loudly
    with re-bucketing guidance."""
    import json
    import os

    from drivers_of_global_deforestation_ray.stages.bucketed import (
        bucketed_agg, bucketed_join, write_bucketed)

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 40, 500).astype(np.int64),
                         "lv": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.arange(40, dtype=np.int64),
                          "rv": np.arange(40, dtype=np.int64) * 3})
    lp = os.path.join(str(tmp_path), "l")
    rp = os.path.join(str(tmp_path), "r")
    # tiny target forces every multi-file left bucket into several groups
    write_bucketed(rd.from_pandas(left).repartition(6), lp, "k",
                   num_buckets=4, target_bucket_bytes=1)
    write_bucketed(rd.from_pandas(right).repartition(2), rp, "rk",
                   num_buckets=4, target_bucket_bytes=1)
    # right bucket exceeds target=1 byte -> loud per-task error
    with pytest.raises(Exception, match="target_bucket_bytes"):
        bucketed_join(lp, rp).to_pandas()
    # relax the right manifest's target: the split left path must still be
    # exactly the plain merge
    man = os.path.join(rp, "_bucketing.json")
    m = json.load(open(man))
    m["target_bucket_bytes"] = 1 << 30
    json.dump(m, open(man, "w"))
    ml = os.path.join(lp, "_bucketing.json")
    m2 = json.load(open(ml))
    assert m2["target_bucket_bytes"] == 1  # manifest records the target
    got = bucketed_join(lp, rp, how="inner").to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))
    # the fan-out really split: more work items than buckets
    from drivers_of_global_deforestation_ray.stages.bucketed import (
        _bucket_files, _file_groups)
    n_items = sum(len(_file_groups(_bucket_files(lp, b), 1)) for b in range(4))
    assert n_items > 4
    # oversize agg bucket raises
    with pytest.raises(Exception, match="more buckets"):
        bucketed_agg(lp, ["k"], {"n": ("lv", "size")}).to_pandas()


def test_bucket_of_high_bits_mix():
    """Stride-structured keys (the weak case for low product bits) must
    spread across buckets via the high-bit Fibonacci hash."""
    from drivers_of_global_deforestation_ray.stages.bucketed import bucket_of

    keys = (np.arange(4096, dtype=np.int64) * 1024)  # stride 2^10
    b = bucket_of(keys, 32)
    counts = np.bincount(b, minlength=32)
    assert counts.min() > 0 and counts.max() < 4096 * 0.2
    # negative keys wrap deterministically, no crash
    bneg = bucket_of(np.array([-5, -1, 0, 1], dtype=np.int64), 8)
    assert ((bneg >= 0) & (bneg < 8)).all()
