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


def test_media_real_backend_is_marked_stub():
    with pytest.raises(NotImplementedError):
        MediaFeaturizer(backend="real")


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
