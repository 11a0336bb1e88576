"""End-to-end multimodal curation: triage correctness, planted near-dup
removal, partitioning invariance, payload drop at the stage boundary."""

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.functions.jpegmeta import (
    encode_jpeg_shell)
from drivers_of_global_deforestation_ray.functions.png import (
    encode_png, png_dims)
from drivers_of_global_deforestation_ray.pipelines.media import (
    MediaCurationConfig, media_triage, run_media_curation)


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


def _gradient_png(w: int, h: int, seed: int) -> bytes:
    img = ((np.arange(h)[:, None] * 2 + np.arange(w)[None, :] * 3
            + seed) % 256).astype(np.uint8)
    return encode_png(img)


# constant-tone levels landing in DISTINCT luminance-histogram bins: the
# feature vectors are provably far apart (max pairwise cosine ~0.40 after
# the JL projection), so only the PLANTED pairs can near-dup at 0.98
_LEVELS = [30, 80, 130, 180, 230]


def _tone_png(level: int, w: int, h: int) -> bytes:
    return encode_png(np.full((h, w), level, np.uint8))


def _tone_jpeg(level: int, w: int, h: int) -> bytes:
    from drivers_of_global_deforestation_ray.functions.jpeg import encode_jpeg

    return encode_jpeg(np.full((h, w), level, np.uint8))


def _tone_jpeg_prog(level: int, w: int, h: int) -> bytes:
    from drivers_of_global_deforestation_ray.functions.jpeg import (
        encode_jpeg_progressive)

    return encode_jpeg_progressive(np.full((h, w), level, np.uint8))


def _corpus() -> pd.DataFrame:
    rows = []
    # 5 well-separated PNGs + 5 FEATURE-duplicate partners: ids 100..104
    # share tone with 0..4 but at DIFFERENT pixel dimensions — constant
    # tone -> identical feature vector, so the near-dup is semantic
    # (feature-level), not byte-level
    for i, lv in enumerate(_LEVELS):
        rows.append((i, _tone_png(lv, 10 + i, 12 + i)))
    for j, lv in enumerate(_LEVELS):
        rows.append((100 + j, _tone_png(lv, 30 + j, 8 + j)))
    # JPEG shells: two in-window (header-valid, NO scan data -> real decode
    # fails -> decode_ok=False passthrough survivor; the progressive shell
    # now takes the same decode path since SOF2 is decodable), one
    # oversized (triage-dropped), one lossless-process (fmt="jpeg_other" —
    # the only coding process still routed around the decode)
    rows.append((200, encode_jpeg_shell(640, 480, ncomp=3)))
    rows.append((201, encode_jpeg_shell(9000, 100, ncomp=3)))
    rows.append((210, encode_jpeg_shell(320, 240, ncomp=3, progressive=True)))
    rows.append((212, encode_jpeg_shell(320, 240, ncomp=3, sof_marker=0xC3)))
    # REAL baseline JPEGs: a constant-tone near-dup pair (same tone,
    # different dims -> identical decoded features) + a distinct tone
    rows.append((300, _tone_jpeg(48, 24, 18)))
    rows.append((301, _tone_jpeg(48, 40, 30)))
    rows.append((302, _tone_jpeg(208, 20, 20)))
    # REAL progressive JPEGs: 310 near-dups the BASELINE 302 (same tone,
    # different dims — a cross-coding-process pair), 311 is distinct
    rows.append((310, _tone_jpeg_prog(208, 36, 28)))
    rows.append((311, _tone_jpeg_prog(112, 22, 26)))
    # tiny PNG (dim-filtered) and a non-media payload (format-filtered)
    rows.append((202, encode_png(np.zeros((2, 2), np.uint8))))
    rows.append((203, b"plain text, not an image"))
    return pd.DataFrame({"doc_id": np.asarray([r[0] for r in rows], np.int64),
                         "payload": [r[1] for r in rows]})


def test_png_dims_header_only():
    p = _gradient_png(33, 21, 7)
    assert png_dims(p) == (33, 21)
    with pytest.raises(ValueError):
        png_dims(b"\x89PNG\r\n\x1a\nxxxxJUNK")
    with pytest.raises(ValueError):
        png_dims(b"GIF89a")


def test_media_triage_formats_and_dims(rd):
    df = _corpus()
    out = (media_triage(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(df)
    by = out.set_index("doc_id")
    assert by.loc[0, "fmt"] == "png" and by.loc[0, "width"] == 10
    assert by.loc[200, "fmt"] == "jpeg" and by.loc[200, "width"] == 640
    assert by.loc[201, "width"] == 9000  # triage reports, filter drops
    assert by.loc[210, "fmt"] == "jpeg_progressive"  # SOF2 share observable
    assert by.loc[300, "fmt"] == "jpeg" and by.loc[300, "width"] == 24
    assert by.loc[202, "width"] == 2
    assert by.loc[203, "fmt"] == "other" and by.loc[203, "width"] == -1


def test_media_curation_drops_planted_dups_and_is_partition_invariant(rd):
    df = _corpus()
    cfg = MediaCurationConfig(num_partitions=2)
    outs = []
    for parts in (2, 5):
        rpt: dict = {}
        got = (run_media_curation(rd.from_pandas(df).repartition(parts),
                                  cfg, report=rpt)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got)
    a, b = outs
    pd.testing.assert_frame_equal(a, b[a.columns])
    ids = set(a["doc_id"])
    # every planted exact-dup pair lost its HIGHER id (min-id wins)
    for j in range(5):
        assert j in ids and (100 + j) not in ids
    # the planted JPEG near-dup pair went through the REAL baseline decode
    # and lost its higher id too; the distinct-tone JPEG survived
    assert 300 in ids and 301 not in ids and 302 in ids
    # the CROSS-coding-process pair: the progressive 310 decodes to the
    # same pixels family as baseline 302 (same tone) and loses, while the
    # distinct-tone progressive 311 survives through the full decode path
    assert 310 not in ids and 311 in ids
    assert a.set_index("doc_id").loc[311, "fmt"] == "jpeg_progressive"
    # the scan-less shells (baseline AND progressive) are header-valid but
    # undecodable: they survive as decode_ok=False passthrough rows
    # instead of killing the pipeline
    assert 200 in ids and 210 in ids
    # the lossless-process shell is the one routed around the decode
    assert 212 in ids
    assert a.set_index("doc_id").loc[212, "fmt"] == "jpeg_other"
    # dim/format-filtered payloads are gone
    assert 201 not in ids and 202 not in ids and 203 not in ids
    assert set(a.columns) == {"doc_id", "fmt", "width", "height"}
    # report monotonicity: input >= in_window >= survivors
    assert rpt["input"] == len(df)
    assert rpt["input"] >= rpt["in_window"] >= rpt["survivors"]
    assert rpt["neardup_pairs"] >= 7
    assert rpt["decode_failed"] == 2        # both scan-less shells
    assert rpt["routed_around"] == 1        # the lossless-process shell
    # every well-separated PNG survived (no false-positive drops at 0.98:
    # max distinct-pair cosine is ~0.40 by construction)
    assert all(i in ids for i in range(5))


def test_media_resize_preserves_jpeg_coding_process(rd):
    """Thumbnails keep the source's container format AND coding process:
    a progressive (SOF2) source re-encodes as a progressive thumbnail."""
    from drivers_of_global_deforestation_ray.functions.jpegmeta import jpeg_dims
    from drivers_of_global_deforestation_ray.stages.multimodal import media_resize

    df = pd.DataFrame({"doc_id": np.asarray([0, 1], np.int64),
                       "payload": [_tone_jpeg(90, 30, 22),
                                   _tone_jpeg_prog(90, 30, 22)]})
    out = (media_resize(rd.from_pandas(df), media_col="payload",
                        width=12, height=10, backend="real")
           .to_pandas().sort_values("doc_id"))
    dims = [jpeg_dims(t) for t in out["thumb"]]
    assert dims[0] == (12, 10, 1, False)   # baseline stays baseline
    assert dims[1] == (12, 10, 1, True)    # progressive stays progressive
