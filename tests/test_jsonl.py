"""Typed JSONL source/sink: lossless floats, escaping, nulls, roundtrip."""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from drivers_of_global_deforestation_ray.sources.jsonio import (
    jsonl_bytes,
    read_jsonl_typed,
    write_jsonl_dir,
)


def test_jsonl_bytes_escaping_and_types():
    df = pd.DataFrame({
        "i": np.array([1, -7, 2**62], dtype=np.int64),
        "f": np.array([1 / 3, -0.0, float("nan")]),
        "b": [True, False, True],
        "s": ['plain', 'quote " back \\ slash', 'ctrl \t\n\x01 end'],
    })
    lines = jsonl_bytes(df).decode().splitlines()
    assert len(lines) == 3
    parsed = [json.loads(ln) for ln in lines]
    assert parsed[0] == {"i": 1, "f": 1 / 3, "b": True, "s": "plain"}
    assert parsed[1]["s"] == 'quote " back \\ slash'
    assert parsed[1]["f"] == -0.0
    assert parsed[2]["s"] == "ctrl \t\n\x01 end"
    assert parsed[2]["f"] is None  # nan -> null
    assert parsed[2]["i"] == 2**62


def test_jsonl_float_shortest_roundtrip():
    # every finite double must survive text serialization bit-for-bit
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(100) * 10.0 ** rng.integers(-300, 300, 100),
        np.array([0.1, 1 / 3, math.pi, 5e-324, 1.7976931348623157e308]),
    ])
    df = pd.DataFrame({"x": vals})
    back = [json.loads(ln)["x"] for ln in jsonl_bytes(df).decode().splitlines()]
    assert np.array_equal(np.array(back), vals)


def test_jsonl_none_string_is_null():
    df = pd.DataFrame({"s": ["a", None, "c"]})
    parsed = [json.loads(ln) for ln in jsonl_bytes(df).decode().splitlines()]
    assert [p["s"] for p in parsed] == ["a", None, "c"]


def test_jsonl_dir_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    n = 5000
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "v": rng.standard_normal(n),
        "tag": [f'tag "{i % 13}"\n' for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(4)
    out = str(tmp_path / "jl")
    rows = write_jsonl_dir(ds, out)
    assert rows == n
    back = read_jsonl_typed(out, {
        "k": pa.int64(), "v": pa.float64(), "tag": pa.string(),
    }).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_jsonl_typed_read_no_inference_drift(ray_session, tmp_path):
    # an all-integer shard of a declared-float column must stay float64
    p = tmp_path / "a.jsonl"
    p.write_text('{"x":1}\n{"x":2}\n')
    ds = read_jsonl_typed(str(p), {"x": pa.float64()})
    assert ds.schema().types[0] == pa.float64()


def test_jsonl_empty_block():
    assert jsonl_bytes(pd.DataFrame({"a": []})) == b""


def test_jsonl_gz_dir_all_compressed(ray_session, tmp_path):
    """An all-.gz directory reads with inferred gzip + gz-only extensions."""
    import gzip

    import ray.data as rd  # noqa: F401

    d = tmp_path / "gz"
    d.mkdir()
    (d / "a.jsonl.gz").write_bytes(gzip.compress(b'{"x":1}\n{"x":2}\n'))
    (d / "b.jsonl.gz").write_bytes(gzip.compress(b'{"x":3}\n'))
    got = sorted(read_jsonl_typed(str(d), {"x": pa.int64()}).to_pandas()["x"])
    assert got == [1, 2, 3]


def test_jsonl_mixed_gz_plain_dir_rejected(ray_session, tmp_path):
    """Mixed .gz/plain parts in one call must fail LOUDLY (gzip
    open-stream args would otherwise apply to the plain file too)."""
    import gzip

    d = tmp_path / "mix"
    d.mkdir()
    (d / "a.jsonl.gz").write_bytes(gzip.compress(b'{"x":1}\n'))
    (d / "b.jsonl").write_text('{"x":2}\n')
    with pytest.raises(ValueError, match="mixed compressed"):
        read_jsonl_typed(str(d), {"x": pa.int64()})
    # and a list whose FIRST path is plain but carries a .gz later
    with pytest.raises(ValueError, match="mixed compressed"):
        read_jsonl_typed([str(d / "b.jsonl"), str(d / "a.jsonl.gz")],
                         {"x": pa.int64()})
