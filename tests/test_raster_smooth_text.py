"""Raster model, zonal rollups, smoothing tie-breaks, text kernels."""

import json
import os

import duckdb
import numpy as np
import pandas as pd

from drivers_of_global_deforestation_ray.functions import text as T
from drivers_of_global_deforestation_ray.functions.grid import MINI_GRID
from drivers_of_global_deforestation_ray.state import raster as RS
from drivers_of_global_deforestation_ray.stages.smooth import dense_class_array, smooth_batch


# --- raster ---------------------------------------------------------------

def test_raster_roundtrip_and_dim_gate(tmp_path):
    ref = RS.GeoRef.from_grid(MINI_GRID)
    g = np.arange(64 * 64, dtype=float).reshape(64, 64)
    RS.write_raster(str(tmp_path / "a"), g, ref)
    vals, ref2 = RS.read_raster(str(tmp_path / "a"))
    assert (np.asarray(vals) == g).all() and ref2 == ref
    # dimension validation gate (Supplemental_Data_1.R:174-186)
    bad = np.zeros((32, 64))
    try:
        RS.write_raster(str(tmp_path / "b"), bad, ref)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_registry_gather_positional(tmp_path):
    ref = RS.GeoRef.from_grid(MINI_GRID)
    g = np.arange(64 * 64, dtype=float).reshape(64, 64)
    RS.write_raster(str(tmp_path / "f"), g, ref)
    json.dump([{"name": "f", "stem": "f"}], open(tmp_path / "features.json", "w"))
    reg = RS.RasterRegistry(str(tmp_path / "features.json"))
    tid = np.asarray([1, 64, 65, 4096])
    assert list(reg.gather(tid)["f"]) == [0.0, 63.0, 64.0, 4095.0]


def test_zonal_downsample_aggs():
    fine = np.arange(16, dtype=float).reshape(4, 4)
    assert (RS.zonal_downsample(fine, 2, "mean") == [[2.5, 4.5], [10.5, 12.5]]).all()
    assert (RS.zonal_downsample(fine, 2, "max") == [[5, 7], [13, 15]]).all()
    assert (RS.zonal_downsample(fine, 2, "sum") == [[10, 18], [42, 50]]).all()
    withnan = fine.copy()
    withnan[0, 0] = np.nan
    m = RS.zonal_downsample(withnan, 2, "mean")
    assert abs(m[0, 0] - np.nanmean([1, 4, 5])) < 1e-12
    allnan = np.full((2, 2), np.nan)
    assert np.isnan(RS.zonal_downsample(allnan, 2, "mean")[0, 0])


def test_two_level_zonal_lineage():
    # <src>_10kMean1kMax: fine -> 1k max -> 10k mean (SURVEY.md A7)
    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 1, (16, 16))
    level1 = RS.zonal_downsample(raw, 2, "max")
    level2 = RS.zonal_downsample(level1, 2, "mean")
    want_l1 = raw.reshape(8, 2, 8, 2).swapaxes(1, 2).reshape(8, 8, 4).max(axis=2)
    want = want_l1.reshape(4, 2, 4, 2).swapaxes(1, 2).reshape(4, 4, 4).mean(axis=2)
    assert np.allclose(level1, want_l1)
    assert np.allclose(level2, want)


def test_assemble_grid_realign():
    # rastOut semantics: join onto dense id domain, NaN fill (R:54-64)
    tid = np.asarray([1, 5, 4096])
    vals = np.asarray([10.0, 20.0, 30.0])
    grid = RS.assemble_grid(tid, vals, 64, 64)
    assert grid[0, 0] == 10 and grid[0, 4] == 20 and grid[63, 63] == 30
    assert np.isnan(grid[0, 1])
    ids, flat = RS.grid_to_table_arrays(grid)
    assert ids[0] == 1 and ids[-1] == 4096 and flat[4] == 20.0


# --- smoothing ------------------------------------------------------------

def _mk_dense(cells: dict, nrows=64, ncols=64):
    tid = np.asarray([r * ncols + c + 1 for (r, c) in cells], dtype=np.int64)
    cls = np.asarray(list(cells.values()), dtype=np.int64)
    return tid, cls, dense_class_array(tid, cls, nrows * ncols)


def test_smooth_takes_nearest_ring_first():
    # center (10,10)=0; ring1 has class 3 at (9,10); ring2 has class 1s
    cells = {(10, 10): 0, (9, 10): 3, (8, 10): 1, (8, 11): 1, (8, 9): 1}
    tid, cls, dense = _mk_dense(cells)
    out = smooth_batch(tid, cls, dense, MINI_GRID, 0, 2)
    assert out[0] == 3  # ring 1 wins even though ring 2 has majority


def test_smooth_majority_then_lowest_class():
    cells = {(20, 20): 0, (19, 19): 5, (19, 20): 5, (19, 21): 2, (20, 19): 2, (21, 21): 4}
    tid, cls, dense = _mk_dense(cells)
    out = smooth_batch(tid, cls, dense, MINI_GRID, 0, 1)
    assert out[0] == 2  # 5 and 2 tie 2-2 in ring 1 -> lowest class id wins
    cells2 = {(30, 30): 0, (29, 30): 4, (29, 31): 4, (30, 31): 1}
    tid2, cls2, dense2 = _mk_dense(cells2)
    assert smooth_batch(tid2, cls2, dense2, MINI_GRID, 0, 1)[0] == 4  # majority


def test_smooth_no_neighbor_stays_zero_and_classified_unchanged():
    cells = {(40, 40): 0, (50, 50): 3}
    tid, cls, dense = _mk_dense(cells)
    out = smooth_batch(tid, cls, dense, MINI_GRID, 0, 2)
    assert out[0] == 0 and out[1] == 3


def test_smooth_edge_clip():
    cells = {(0, 0): 0, (0, 1): 2}
    tid, cls, dense = _mk_dense(cells)
    assert smooth_batch(tid, cls, dense, MINI_GRID, 0, 1)[0] == 2


# --- text kernels ---------------------------------------------------------

def test_token_counts_match_duckdb_semantics():
    texts = ["hello  world", "", "  a\tb\nc  ", "one"]
    s = pd.Series(texts)
    con = duckdb.connect()
    want = con.execute(
        "SELECT array_length(regexp_extract_all(t, '\\S+')) AS n, "
        "length(regexp_replace(t, '\\s', '', 'g')) AS c FROM (SELECT unnest(?) AS t)",
        [texts],
    ).df()
    assert list(T.token_counts(s)) == [x or 0 for x in want["n"].fillna(0).astype(int)]
    assert list(T.char_counts_nospace(s)) == list(want["c"].astype(int))


def test_quality_stats_ranges():
    q = T.quality_stats(pd.Series(["the cat and the dog sat on a mat today", "!!!", ""]))
    assert 0 <= q["quality_score"][0] <= 1 and q["quality_score"][0] == 1.0
    assert q["quality_score"][1] < 1.0
    assert q["n_tokens"][2] == 0


def test_langid_markers_and_cjk():
    out = T.langid_batch([
        "the cat and the dog is in the house",
        "el perro y la casa en que no se ve",
        "le chien et la maison dans les rues",
        "der hund und das haus ist nicht da",
        "这是一个中文测试文档 有很多汉字",
        "これは日本語のテストです",
        "",
    ])
    assert out == ["en", "es", "fr", "de", "zh", "ja", "und"]


def test_fingerprints_stable_and_distinct():
    a = T.md5_fingerprints(["abc", "abc", "abd"])
    assert a[0] == a[1] != a[2]
    r = T.rolling_fingerprints(["abc", "abc", "abd", ""])
    assert r[0] == r[1] != r[2]
    # matches a fresh process-independent recompute
    assert list(T.rolling_fingerprints(["abc"])) == [r[0]]


def test_char_entropy_matches_counter_reference():
    from collections import Counter
    import math

    from drivers_of_global_deforestation_ray.functions.text import char_entropy

    texts = ["aaaa", "abab", "", "a", "the quick brown fox", "日本語テキスト",
             "aabbccddee" * 50, None]
    lens, ent = char_entropy(texts)
    for t, L, e in zip(texts, lens, ent):
        t = t or ""
        assert L == len(t)
        if not t:
            assert e == 0.0
            continue
        c = Counter(t)
        want = -sum((n / len(t)) * math.log2(n / len(t)) for n in c.values())
        assert abs(e - round(want, 6)) <= 1e-9
    # single-char docs must give +0.0, never -0.0
    assert math.copysign(1.0, ent[3]) == 1.0


def test_compress_ratio_separates_boilerplate_from_noise():
    import zlib

    from drivers_of_global_deforestation_ray.functions.text import compress_ratio

    import random
    rnd = random.Random(3)
    noisy = "".join(chr(rnd.randrange(33, 127)) for _ in range(2000))
    texts = ["spam spam spam " * 200, noisy, "", None, "abc"]
    comp, ratio = compress_ratio(texts)
    assert ratio[0] < 0.05 < 0.8 < ratio[1]          # boilerplate vs noise
    assert comp[2] == 0 and ratio[2] == 0.0
    assert comp[3] == 0 and ratio[3] == 0.0
    want = len(zlib.compress(b"abc", 6))
    assert comp[4] == want and abs(ratio[4] - round(want / 3, 6)) < 1e-12
    # determinism: identical output on a permuted batch
    comp2, ratio2 = compress_ratio(list(reversed(texts)))
    assert list(comp2[::-1]) == list(comp) and list(ratio2[::-1]) == list(ratio)
