"""Multimodal plumbing, pages generator determinism, enrichment stage."""

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.sources.pages import PAGES_SCHEMA, pages_table
from drivers_of_global_deforestation_ray.stages.multimodal import (
    FEATURE_DIM,
    MediaFeaturizer,
    frame_sample,
    media_features,
    media_resize,
)
from drivers_of_global_deforestation_ray.stages.textstage import enrich_documents


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def test_pages_schema_and_determinism():
    a = pages_table(100, seed=42)
    b = pages_table(100, seed=42)
    assert a.schema == PAGES_SCHEMA
    assert a.equals(b)
    # batch-boundary independence: rows [50, 100) generated standalone match
    c = pages_table(50, seed=42, offset=50, total=100)
    assert a.slice(50, 50).to_pydict() == c.to_pydict()
    # different seed -> different corpus
    assert not a.equals(pages_table(100, seed=43))


def test_pages_planted_duplicates_and_hot_url():
    t = pages_table(60, seed=42).to_pandas()
    assert t.loc[13, "text"].split("\n")[2] == t.loc[12, "text"].split("\n")[2]  # body dup
    hot = pages_table(100, seed=42, hot_frac=0.2).to_pandas()
    assert (hot["url"] == "https://hot.example.com/popular/0").sum() == 20
    assert hot["warc_ts"].nunique() > 90  # re-crawls differ in ts


def test_media_featurizer_fake_backend(rd):
    t = pages_table(64, seed=1).to_pandas()
    ds = rd.from_pandas(t[["url", "html"]]).repartition(4)
    out = media_features(ds, media_col="html").to_pandas()
    assert len(out) == 64
    assert out["media_width"].between(64, 255).all()
    assert out["media_height"].between(64, 255).all()
    assert all(len(f) == FEATURE_DIM for f in out["media_features"])
    # deterministic: same payload -> same features
    out2 = media_features(rd.from_pandas(t[["url", "html"]]).repartition(7),
                          media_col="html").to_pandas()
    m1 = out.sort_values("url")["media_width"].to_numpy()
    m2 = out2.sort_values("url")["media_width"].to_numpy()
    assert (m1 == m2).all()


def test_media_resize_bounded_output(rd):
    t = pages_table(40, seed=2).to_pandas()
    out = media_resize(rd.from_pandas(t[["url", "html"]]).repartition(3),
                       media_col="html", width=16, height=16).to_pandas()
    assert len(out) == 40
    assert "html" not in out.columns  # source payload dropped from the output
    assert all(len(x) == 16 * 16 for x in out["thumb"])
    assert (out["thumb_width"] == 16).all() and (out["thumb_height"] == 16).all()
    # deterministic across partitioning
    out2 = media_resize(rd.from_pandas(t[["url", "html"]]).repartition(9),
                        media_col="html", width=16, height=16).to_pandas()
    a = out.sort_values("url")["thumb"].tolist()
    b = out2.sort_values("url")["thumb"].tolist()
    assert a == b


def test_frame_sample_explode(rd):
    t = pages_table(25, seed=3).to_pandas()
    out = frame_sample(rd.from_pandas(t[["url", "html"]]).repartition(4),
                       media_col="html", key_col="url",
                       num_frames=3, frame_ms=40).to_pandas()
    assert len(out) == 25 * 3
    g = out.groupby("url")
    assert (g.size() == 3).all()
    assert sorted(out["frame_idx"].unique().tolist()) == [0, 1, 2]
    assert (out["ts_ms"] == out["frame_idx"] * 40).all()
    # frames are per-(payload, idx) deterministic and distinct across idx
    one = out[out["url"] == t["url"].iloc[0]].sort_values("frame_idx")
    assert len(set(one["frame"].tolist())) == 3


def test_media_backend_validation():
    # every media stage is real now (PNG / WAV / Y4M codecs); unknown
    # backends are rejected loudly
    from drivers_of_global_deforestation_ray.stages.multimodal import _FrameSampler
    with pytest.raises(ValueError):
        _FrameSampler("html", "url", 3, 40, backend="nonsense")
    with pytest.raises(ValueError):
        MediaFeaturizer(backend="nonsense")


def test_enrich_documents_stage(rd):
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the cat and the dog sat on the mat",
                 "el perro y la casa en que no se",
                 "zz", ""],
    })
    out = enrich_documents(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(out["n_tokens"]) == [9, 9, 1, 0]
    assert out.loc[0, "lang_pred"] == "en" and out.loc[1, "lang_pred"] == "es"
    assert out["fingerprint_md5"].nunique() == 4
    assert set(out.columns) >= {"quality_score", "punct_ratio", "stop_ratio",
                                "mean_token_len", "fingerprint_roll"}


# ---------------------------------------------------------------------------
# real PNG backend (VERDICT r02 #6)
# ---------------------------------------------------------------------------

def _png_corpus(n=12, seed=4):
    from drivers_of_global_deforestation_ray.functions.png import encode_png
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        ch = int(rng.choice([1, 3, 4]))
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        rows.append({"url": f"img://{i}", "html": encode_png(img),
                     "true_w": w, "true_h": h})
    return pd.DataFrame(rows)


def test_media_features_real_png(rd):
    from drivers_of_global_deforestation_ray.stages.multimodal import media_features
    corpus = _png_corpus()
    ds = rd.from_pandas(corpus).repartition(3)
    out = media_features(ds, backend="real", concurrency=2).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    exp = corpus.sort_values("url").reset_index(drop=True)
    assert (out["media_width"].to_numpy() == exp["true_w"].to_numpy()).all()
    assert (out["media_height"].to_numpy() == exp["true_h"].to_numpy()).all()
    feats = np.stack(out["media_features"].to_numpy())
    assert feats.shape[1] == 16
    assert (feats >= 0).all() and (feats <= 1).all()
    assert np.allclose(feats[:, 8:16].sum(axis=1), 1.0)  # histogram fractions


def test_media_resize_real_png_roundtrip(rd):
    from drivers_of_global_deforestation_ray.functions.png import decode_png
    from drivers_of_global_deforestation_ray.stages.multimodal import media_resize
    corpus = _png_corpus(8, seed=9)
    ds = rd.from_pandas(corpus).repartition(2)
    out = media_resize(ds, width=16, height=12, backend="real",
                       concurrency=2).to_pandas()
    assert "html" not in out.columns  # payload dropped
    for t in out["thumb"]:
        img = decode_png(t)
        assert img.shape[:2] == (12, 16)


def test_y4m_codec_roundtrip():
    """From-scratch YUV4MPEG2 codec: byte-exact luma roundtrip, header
    fields, Cmono variant, malformed-stream errors."""
    import numpy as np
    import pytest

    from drivers_of_global_deforestation_ray.functions.y4m import (
        decode_y4m, encode_y4m, parse_y4m_header)

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (7, 12, 16), dtype=np.uint8)
    data = encode_y4m(frames, fps=(30, 1))
    p = parse_y4m_header(data)
    assert (p["width"], p["height"], p["fps_num"], p["fps_den"]) == (16, 12, 30, 1)
    assert p["colorspace"] == "C420jpeg"
    p2, back = decode_y4m(data)
    assert p2["n_frames"] == 7 and (back == frames).all()
    # Cmono: no chroma planes, smaller stream, same luma
    mono = encode_y4m(frames, fps=(24, 1), colorspace="Cmono")
    assert len(mono) < len(data)
    _, backm = decode_y4m(mono)
    assert (backm == frames).all()
    # errors: bad magic, odd dims for C420, truncated frame
    with pytest.raises(ValueError):
        parse_y4m_header(b"RIFF....")
    with pytest.raises(ValueError):
        encode_y4m(frames[:, :11, :], colorspace="C420jpeg")
    with pytest.raises(ValueError):
        decode_y4m(data[:-5])


def test_frame_sample_real_y4m(ray_session):
    """Real frame sampling: fps-based wall-clock frame selection with
    clamping at the clip end; emitted bytes are the exact luma planes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.y4m import encode_y4m
    from drivers_of_global_deforestation_ray.stages.multimodal import frame_sample

    # 4 frames at 5 fps (200 ms apart), distinct constant luma per frame
    frames = np.stack([np.full((8, 8), 10 * k, np.uint8) for k in range(4)])
    clip = encode_y4m(frames, fps=(5, 1))
    ds = rd.from_pandas(pd.DataFrame({"vid": [7], "video": [clip]}))
    out = (frame_sample(ds, media_col="video", key_col="vid", num_frames=6,
                        frame_ms=300, backend="real")
           .to_pandas().sort_values("frame_idx"))
    # sample instants 0,300,...,1500 ms at 5 fps -> frames 0,1,3,4->3,6->3,7->3
    want_frame = [0, 1, 3, 3, 3, 3]
    assert [x[0] for x in out["frame"]] == [10 * f for f in want_frame]
    assert all(len(x) == 64 for x in out["frame"])
    assert out["ts_ms"].tolist() == [0, 300, 600, 900, 1200, 1500]


# --- JPEG marker-syntax metadata ---------------------------------------

def test_jpeg_dims_shell_and_edge_cases():
    from drivers_of_global_deforestation_ray.functions.jpegmeta import (
        encode_jpeg_shell, jpeg_dims)

    w, h, nc, prog = jpeg_dims(encode_jpeg_shell(640, 480, ncomp=3))
    assert (w, h, nc, prog) == (640, 480, 3, False)
    w, h, nc, prog = jpeg_dims(encode_jpeg_shell(65535, 1, ncomp=1,
                                                 progressive=True))
    assert (w, h, nc, prog) == (65535, 1, 1, True)
    import pytest as _pt
    with _pt.raises(ValueError):
        jpeg_dims(b"\x89PNG\r\n\x1a\n")       # not a JPEG
    with _pt.raises(ValueError):
        jpeg_dims(b"\xff\xd8\xff\xd9")          # SOI+EOI, no SOF
    shell = encode_jpeg_shell(10, 10)
    with _pt.raises(ValueError):
        jpeg_dims(shell[:8])                     # truncated segment


def test_jpeg_dims_skips_fill_bytes_and_rst():
    from drivers_of_global_deforestation_ray.functions.jpegmeta import (
        encode_jpeg_shell, jpeg_dims)

    shell = encode_jpeg_shell(33, 44, ncomp=2)
    # inject fill FFs and a standalone RST marker between segments
    padded = shell[:2] + b"\xff\xff" + b"\xff\xd0" + shell[2:]
    assert jpeg_dims(padded)[:3] == (33, 44, 2)
