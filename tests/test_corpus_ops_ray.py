"""Pretraining corpus-assembly ops: deterministic mixing, sequence
chunking, benchmark decontamination (stages/textstage.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.stages.textstage import (
    _word_trigrams,
    chunk_documents,
    decontaminate,
    deterministic_mix,
)


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


# --- deterministic_mix -----------------------------------------------------

def test_mix_ratio_extremes_and_determinism(rd):
    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "source": np.where(np.arange(2000) % 2 == 0, "all", "none"),
    })
    ratios = {"all": 1.0, "none": 0.0}
    outs = []
    for parts in (1, 7):
        got = (deterministic_mix(rd.from_pandas(df).repartition(parts), ratios)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(got)
    assert outs[0].equals(outs[1])  # partitioning-invariant selection
    assert (outs[0]["source"] == "all").all()
    assert len(outs[0]) == 1000  # ratio 1.0 keeps everything, 0.0 nothing


def test_mix_fraction_close_to_ratio_and_stable(rd):
    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64),
                       "source": "s"})
    a = deterministic_mix(rd.from_pandas(df), {"s": 0.3}).to_pandas()
    b = deterministic_mix(rd.from_pandas(df), {"s": 0.3}).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # run-to-run identical
    assert abs(len(a) / 5000 - 0.3) < 0.03  # md5 uniform ≈ ratio
    # unknown source -> dropped
    df2 = pd.DataFrame({"doc_id": [1, 2], "source": ["mystery", "s"]})
    got = deterministic_mix(rd.from_pandas(df2), {"s": 1.0}).to_pandas()
    assert got["source"].tolist() == ["s"]
    # monotone: a doc kept at ratio r is kept at every r' > r
    lo = set(deterministic_mix(rd.from_pandas(df), {"s": 0.2}).to_pandas()["doc_id"])
    hi = set(deterministic_mix(rd.from_pandas(df), {"s": 0.6}).to_pandas()["doc_id"])
    assert lo <= hi


# --- chunk_documents -------------------------------------------------------

def test_chunk_boundaries_exact(rd):
    texts = {
        1: "",                # empty -> one empty chunk
        2: "a" * 99,          # < size -> one chunk
        3: "b" * 100,         # == size -> one chunk
        4: "c" * 101,         # size+1 -> two chunks (second is the overlap tail)
        5: "d" * 180,         # == size+step -> two chunks
        6: "e" * 181,         # one past -> three chunks
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    got = (chunk_documents(rd.from_pandas(df), size=100, overlap=20)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    n = got.groupby("doc_id").size().to_dict()
    assert n == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3}
    # chunk k covers [k*80, k*80+100); every chunk except maybe the last is full
    four = got[got["doc_id"] == 4]
    assert four["chunk_len"].tolist() == [100, 21]
    assert four["chunk_text"].iloc[1] == "c" * 21
    six = got[got["doc_id"] == 6]
    assert six["chunk_len"].tolist() == [100, 100, 21]


def test_chunk_reconstruction_and_overlap(rd):
    rng = np.random.default_rng(3)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, int(ln)))
             for ln in rng.integers(0, 700, 200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    got = (chunk_documents(rd.from_pandas(df), size=100, overlap=20)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    for did, g in got.groupby("doc_id"):
        chunks = g["chunk_text"].tolist()
        # de-overlap reconstruction is byte-identical to the source
        rebuilt = chunks[0] + "".join(c[20:] for c in chunks[1:])
        assert rebuilt == texts[did]
        # consecutive chunks agree on the 20-char overlap
        for a, b in zip(chunks, chunks[1:]):
            assert a[80:] == b[:len(a[80:])]
    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), size=100, overlap=100)


# --- decontaminate ---------------------------------------------------------

def test_decontaminate_planted(rd):
    bench_text = "the quick brown fox jumps over the lazy dog"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            bench_text,                                   # the benchmark doc itself
            "we saw the quick brown fox yesterday",       # shares 2 trigrams
            "completely unrelated words in this text",    # clean
            "quick brown fox",                            # shares exactly 1
        ],
    })
    grams = set(_word_trigrams(np.array([0]), pd.Series([bench_text]))["gram"])
    got = (decontaminate(rd.from_pandas(df).repartition(2), grams)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["contaminated"].tolist() == [1, 1, 0, 1]
    assert got["n_hits"].tolist()[1] == 2   # "the quick brown", "quick brown fox"
    assert got["n_hits"].tolist()[3] == 1
    assert got["n_hits"].iloc[0] == 7       # all 7 of its own trigrams


def test_decontaminate_distinct_counting(rd):
    # a repeated trigram in one doc counts once (DISTINCT per doc)
    df = pd.DataFrame({
        "doc_id": np.array([7], dtype=np.int64),
        "text": ["x y z pad x y z pad x y z"],
    })
    got = decontaminate(rd.from_pandas(df), {"x y z"}).to_pandas()
    assert got["n_hits"].iloc[0] == 1 and got["contaminated"].iloc[0] == 1
    # short docs (<3 words) never match
    df2 = pd.DataFrame({"doc_id": np.array([8], dtype=np.int64), "text": ["x y"]})
    got2 = decontaminate(rd.from_pandas(df2), {"x y z"}).to_pandas()
    assert got2["n_hits"].iloc[0] == 0 and got2["contaminated"].iloc[0] == 0


# ---------------------------------------------------------------------------
# DSIR importance selection (textstage.dsir_scores)
# ---------------------------------------------------------------------------

def _dsir_corpus():
    """Half the docs speak 'target-ese' (alpha/beta vocab), half 'raw-ese'
    (gamma/delta); a handful mix.  DSIR must rank target-ese docs highest."""
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta alpha beta gamma" if i % 10 == 0
                     else "alpha beta alpha beta alpha", "en"))
    for i in range(40, 80):
        rows.append((i, "gamma delta gamma delta gamma", "xx"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_dsir_ranks_targetlike_docs_highest(rd):
    from drivers_of_global_deforestation_ray.stages.textstage import dsir_scores

    df = _dsir_corpus()
    docs = rd.from_pandas(df).repartition(4)
    target = docs.filter(expr="lang == 'en'").select_columns(["doc_id", "text"])
    raw = docs.select_columns(["doc_id", "text"])
    out = dsir_scores(raw, target, num_buckets=512).to_pandas()
    assert len(out) == 80
    s = out.set_index("doc_id")["dsir_weight"]
    # every pure-target doc outscores every pure-raw doc
    assert s[np.arange(1, 40)[np.arange(1, 40) % 10 != 0]].min() > s[
        np.arange(40, 80)].max()
    # mixed docs sit strictly between
    assert s[0] < s[1] and s[0] > s[40]


def test_dsir_partition_and_bucket_determinism(rd):
    from drivers_of_global_deforestation_ray.stages.textstage import dsir_scores

    df = _dsir_corpus()
    outs = []
    for parts in (2, 8):
        docs = rd.from_pandas(df).repartition(parts)
        target = docs.filter(expr="lang == 'en'").select_columns(
            ["doc_id", "text"])
        raw = docs.select_columns(["doc_id", "text"])
        o = dsir_scores(raw, target, num_buckets=512).to_pandas()
        outs.append(o.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# cross-document sequence packing (textstage.pack_sequences)
# ---------------------------------------------------------------------------

def test_pack_sequences_reconstructs_token_stream(rd):
    """The span map must tile the concatenated stream exactly: per sequence,
    spans are disjoint, contiguous from offset 0, and sum to seq_len (except
    the tail); per doc, spans cover [0, n_tokens) in order."""
    from drivers_of_global_deforestation_ray.stages.textstage import pack_sequences

    rng = np.random.default_rng(3)
    docs = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": [" ".join(["w"] * int(rng.integers(1, 40))) for _ in range(50)],
    })
    L = 16
    out = pack_sequences(rd.from_pandas(docs).repartition(4), seq_len=L
                         ).to_pandas().sort_values(
        ["seq_id", "seq_offset"]).reset_index(drop=True)
    n_total = int(docs["text"].str.split(" ").str.len().sum())
    assert out["n_tokens"].sum() == n_total
    for sid, g in out.groupby("seq_id"):
        assert g["seq_offset"].iloc[0] == 0
        assert (g["seq_offset"].to_numpy()[1:]
                == (g["seq_offset"] + g["n_tokens"]).to_numpy()[:-1]).all()
        total = int(g["n_tokens"].sum())
        assert total == L or (sid == out["seq_id"].max() and total <= L)
    for did, g in out.groupby("doc_id"):
        g = g.sort_values("doc_offset")
        assert g["doc_offset"].iloc[0] == 0
        assert (g["doc_offset"].to_numpy()[1:]
                == (g["doc_offset"] + g["n_tokens"]).to_numpy()[:-1]).all()


def test_pack_sequences_partition_invariant(rd):
    from drivers_of_global_deforestation_ray.stages.textstage import pack_sequences

    docs = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [" ".join(["t"] * (3 + 7 * (i % 5))) for i in range(30)],
    })
    key = ["seq_id", "doc_id"]
    a = pack_sequences(rd.from_pandas(docs).repartition(2), seq_len=10
                       ).to_pandas().sort_values(key).reset_index(drop=True)
    b = pack_sequences(rd.from_pandas(docs).repartition(8), seq_len=10
                       ).to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
