"""WARC container codec and Arrow IPC source/sink."""

import gzip
import io

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.sources.warcio import (
    parse_warc_stream, warc_record_bytes)


def _gz(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(raw)
    return buf.getvalue()


def test_warc_record_parse_roundtrip():
    recs = [
        ("https://a.example/x", "2024-01-01T00:00:00Z", b"hello world"),
        ("https://b.example/y", "2024-01-01T00:00:01Z",
         b"binary \r\n\r\n payload with separators \x00\xff"),
        ("https://c.example/z", "2024-01-01T00:00:02Z", b""),
    ]
    stream = b"".join(_gz(warc_record_bytes(u, d, p)) for u, d, p in recs)
    assert parse_warc_stream(stream) == recs
    # plain (uncompressed) stream parses too
    plain = b"".join(warc_record_bytes(u, d, p) for u, d, p in recs)
    assert parse_warc_stream(plain) == recs


def test_warc_skips_non_response_records():
    req = warc_record_bytes("https://a.example/x", "2024-01-01T00:00:00Z",
                            b"GET / HTTP/1.1", rec_type="request")
    resp = warc_record_bytes("https://a.example/x", "2024-01-01T00:00:00Z",
                             b"<html/>")
    got = parse_warc_stream(req + resp)
    assert got == [("https://a.example/x", "2024-01-01T00:00:00Z", b"<html/>")]


def test_warc_truncated_gzip_raises():
    blob = _gz(warc_record_bytes("https://a.example", "2024-01-01T00:00:00Z",
                                 b"abc"))
    with pytest.raises(ValueError):
        parse_warc_stream(blob[:-5])


def test_warc_dir_roundtrip_distributed(ray_session):
    import ray.data as rd

    from drivers_of_global_deforestation_ray.sources.warcio import (
        read_warc_dir, write_warc_dir)

    df = pd.DataFrame({
        "url": [f"https://e.example/{i}" for i in range(200)],
        "date": ["2024-01-01T00:00:00Z"] * 200,
        "payload": [f"payload {i}".encode() for i in range(200)]})
    import shutil
    shutil.rmtree("/tmp/graft_warc_test", ignore_errors=True)
    n = write_warc_dir(rd.from_pandas(df).repartition(5), "/tmp/graft_warc_test")
    assert n == 200
    back = (read_warc_dir("/tmp/graft_warc_test").to_pandas()
            .sort_values("url").reset_index(drop=True))
    want = df.sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == want["url"].tolist()
    assert [bytes(p) for p in back["payload"]] == want["payload"].tolist()


def test_ipc_dir_roundtrip_distributed(ray_session):
    import shutil

    import ray.data as rd

    from drivers_of_global_deforestation_ray.sources.ipcio import (
        read_ipc_dir, write_ipc_dir)

    df = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                       "v": np.arange(300) * 0.5,
                       "s": [f"s{i}" for i in range(300)]})
    shutil.rmtree("/tmp/graft_ipc_test", ignore_errors=True)
    n = write_ipc_dir(rd.from_pandas(df).repartition(4), "/tmp/graft_ipc_test")
    assert n == 300
    back = (read_ipc_dir("/tmp/graft_ipc_test").to_pandas()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df)


def test_orc_dir_roundtrip_distributed(ray_session):
    import shutil

    import ray.data as rd

    from drivers_of_global_deforestation_ray.sources.orcio import (
        read_orc_dir, write_orc_dir)

    df = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                       "v": np.arange(300) * 0.5,
                       "s": [f"s{i}" for i in range(300)],
                       "b": [f"bin{i}".encode() for i in range(300)]})
    shutil.rmtree("/tmp/graft_orc_test", ignore_errors=True)
    n = write_orc_dir(rd.from_pandas(df).repartition(4), "/tmp/graft_orc_test")
    assert n == 300
    back = (read_orc_dir("/tmp/graft_orc_test").to_pandas()
            .sort_values("k").reset_index(drop=True))
    back["b"] = [bytes(x) for x in back["b"]]
    pd.testing.assert_frame_equal(back, df)
    # reader-side column pruning: only requested columns leave the decoder
    pruned = (read_orc_dir("/tmp/graft_orc_test", columns=["k", "s"])
              .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(pruned.columns) == ["k", "s"] and len(pruned) == 300


def test_avro_codec_roundtrip_edge_values():
    import pyarrow as pa

    from drivers_of_global_deforestation_ray.sources.avroio import (
        decode_avro, encode_avro)

    t = pa.table({
        "k": pa.array([0, -1, 1, -(2 ** 62), 2 ** 62, None], pa.int64()),
        "v": pa.array([0.0, -0.0, float("inf"), float("-inf"), 1e-300, None],
                      pa.float64()),
        "s": pa.array(["", "héllo wörld", "a" * 500, "\n\t", None, "x"],
                      pa.string()),
        "b": pa.array([b"", b"\x00\xff\x80", b"obj\x01", None, b"s", b"t"],
                      pa.binary()),
        "f": pa.array([True, False, None, True, False, None], pa.bool_()),
    })
    for codec in ("null", "deflate"):
        back = decode_avro(encode_avro(t, codec=codec))
        assert back.equals(t), codec
        # content-derived sync marker: identical bytes on rewrite
        assert encode_avro(t, codec=codec) == encode_avro(t, codec=codec)
    with pytest.raises(ValueError, match="magic"):
        decode_avro(b"NOTAVRO")
    with pytest.raises(NotImplementedError, match="unsupported column type"):
        encode_avro(pa.table({"x": pa.array([[1, 2]], pa.list_(pa.int64()))}))


def test_avro_dir_roundtrip_distributed(ray_session):
    import shutil

    import ray.data as rd

    from drivers_of_global_deforestation_ray.sources.avroio import (
        read_avro_dir, write_avro_dir)

    df = pd.DataFrame({"k": np.arange(300, dtype=np.int64),
                       "v": np.arange(300) * 0.25,
                       "s": [f"s{i}" for i in range(300)]})
    shutil.rmtree("/tmp/graft_avro_test", ignore_errors=True)
    n = write_avro_dir(rd.from_pandas(df).repartition(4),
                       "/tmp/graft_avro_test")
    assert n == 300
    back = (read_avro_dir("/tmp/graft_avro_test").to_pandas()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df)
