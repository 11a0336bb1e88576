"""Distributed BPE trainer vs the sequential reference; explode_list edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from drivers_of_global_deforestation_ray.functions.bpe import (
    bpe_encode_counts, bpe_reference, bpe_train)
from drivers_of_global_deforestation_ray.stages.relational import explode_list


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data

    return ray.data


TEXTS = [
    "the lowest lower low newer new newest",
    "wider wide widest the the the low lower",
    "new newer newest wide wider the low",
    "es es es es est est est lowest widest",
] * 3  # repetition changes counts, not the tie rules


def test_bpe_matches_sequential_reference(rd):
    ds = rd.from_pandas(pd.DataFrame({"text": TEXTS})).repartition(5)
    got = bpe_train(ds, "text", num_merges=12)
    want = bpe_reference(TEXTS, num_merges=12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_bpe_partitioning_invariant(rd):
    ds1 = rd.from_pandas(pd.DataFrame({"text": TEXTS})).repartition(1)
    ds8 = rd.from_pandas(pd.DataFrame({"text": TEXTS})).repartition(8)
    a = bpe_train(ds1, "text", num_merges=8)
    b = bpe_train(ds8, "text", num_merges=8)
    pd.testing.assert_frame_equal(a, b)


def test_bpe_encode_counts(rd):
    """After enough merges every training word collapses toward one token;
    with zero merges the count is chars+1 (the </w> marker) per word."""
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["low low", "newest"]}))
    merges = bpe_reference(TEXTS, num_merges=0)
    got = (bpe_encode_counts(ds, "text", "doc_id", merges)
           .to_pandas().set_index("doc_id")["n_tokens"])
    assert got[0] == 2 * (3 + 1) and got[1] == 6 + 1
    merges = bpe_reference(TEXTS, num_merges=40)
    got = (bpe_encode_counts(ds, "text", "doc_id", merges)
           .to_pandas().set_index("doc_id")["n_tokens"])
    assert got[0] < 8 and got[1] < 7  # merged subwords shrink the counts


def test_explode_list_positions_and_empties(rd):
    t = pa.table({"vec_id": [1, 2, 3, 4],
                  "embedding": [[1.0, 2.0], [], [3.0], [4.0, 5.0, 6.0]]})
    ds = rd.from_arrow(t).repartition(3)
    got = (explode_list(ds, ["vec_id"], "embedding").to_pandas()
           .sort_values(["vec_id", "pos"]).reset_index(drop=True))
    assert got["vec_id"].tolist() == [1, 1, 3, 4, 4, 4]
    assert got["pos"].tolist() == [0, 1, 0, 0, 1, 2]
    assert got["value"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


# --- duplicate n-gram span removal ------------------------------------------

def _spans_reference(docs, n=3):
    """Brute-force reference of the dedup_spans contract."""
    grams = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        for p in range(len(ws) - n + 1):
            grams.setdefault(" ".join(ws[p:p + n]), []).append((doc_id, p))
    masked = {}
    for occ in grams.values():
        if len(occ) > 1:
            first = min(occ)
            for o in occ:
                if o != first:
                    for i in range(n):
                        masked.setdefault(o[0], set()).add(o[1] + i)
    out = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        kept = [w for i, w in enumerate(ws) if i not in masked.get(doc_id, set())]
        if kept:
            out[doc_id] = " ".join(kept)
    return out


def test_dedup_spans_planted(rd):
    from drivers_of_global_deforestation_ray.stages.dedup import dedup_spans

    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "intro alpha beta gamma delta outro"),          # 4-word overlap
        (3, "alpha beta gamma delta epsilon zeta"),          # full dup of 1
        (4, "unique words only here none shared"),
        (5, "tiny doc"),                                     # shorter than n
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (dedup_spans(rd.from_pandas(df).repartition(3), "text", "doc_id",
                       n=3, num_partitions=3)
           .to_pandas().set_index("doc_id")["text"].to_dict())
    assert got == _spans_reference(docs)
    assert 3 not in got            # the full duplicate vanished
    assert got[1] == docs[0][1]    # first occurrence untouched
    assert got[4] == docs[3][1] and got[5] == docs[4][1]


def test_dedup_spans_partitioning_invariant(rd):
    from drivers_of_global_deforestation_ray.stages.dedup import dedup_spans

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab, 12))) for i in range(60)]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    a = (dedup_spans(rd.from_pandas(df).repartition(1), "text", "doc_id", n=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_spans(rd.from_pandas(df).repartition(16), "text", "doc_id", n=3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert a.equals(pd.DataFrame(
        [(k, v) for k, v in sorted(_spans_reference(docs).items())],
        columns=["doc_id", "text"]))


def test_dedup_spans_fast_hash_matches_md5(rd):
    """The vectorized uint64-polynomial fingerprint path must produce the
    SAME survivors/text as the md5 string path (collisions are 2^-64)."""
    from drivers_of_global_deforestation_ray.stages.dedup import dedup_spans

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(25)]
    docs = [(i, " ".join(rng.choice(vocab, 15))) for i in range(80)]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    a = (dedup_spans(rd.from_pandas(df).repartition(6), "text", "doc_id",
                     n=3, hash="md5")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_spans(rd.from_pandas(df).repartition(6), "text", "doc_id",
                     n=3, hash="fast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# --- geodesic radius join ------------------------------------------------

def test_radius_join_matches_bruteforce_incl_poles(rd):
    """Candidate completeness at the hard spots: polar clusters (lon cells
    shrink), dateline wraparound, and an equator control — every pair the
    brute force finds must surface, at two partitionings."""
    from drivers_of_global_deforestation_ray.stages.spatial import (
        haversine_km, radius_join)

    rng = np.random.default_rng(41)
    pts = [
        # polar cluster: lats 87..89.9, random lons (all mutually close)
        *[(i, 87.0 + rng.random() * 2.9, rng.random() * 360 - 180)
          for i in range(20)],
        # dateline pair
        (100, 10.0, 179.9), (101, 10.0, -179.9),
        # equator cluster + far-away controls
        (200, 0.0, 0.0), (201, 0.5, 0.5), (202, 40.0, 40.0),
        *[(300 + i, rng.random() * 120 - 60, rng.random() * 360 - 180)
          for i in range(40)],
    ]
    df = pd.DataFrame(pts, columns=["doc_id", "lat", "lon"])
    la = df["lat"].to_numpy(); lo = df["lon"].to_numpy()
    ids = df["doc_id"].to_numpy()
    ai, bi = np.triu_indices(len(df), k=1)
    d = haversine_km(la[ai], lo[ai], la[bi], lo[bi])
    want = {(int(ids[ai[k]]), int(ids[bi[k]])): round(float(d[k]), 6)
            for k in range(len(ai)) if d[k] <= 700.0}
    for parts in (1, 8):
        got = (radius_join(rd.from_pandas(df).repartition(parts),
                           "doc_id", "lat", "lon", radius_km=700.0,
                           num_partitions=4).to_pandas())
        got_map = {(int(r.a), int(r.b)): float(r.dist_km)
                   for r in got.itertuples()}
        assert got_map == want
    assert (100, 101) in want  # the dateline pair really is in range


def test_bpe_encode_ids_roundtrips_and_matches_counts(ray_session):
    """bpe_encode_ids: (a) ids decode back to the exact source text via
    the inverted vocab; (b) n_tokens agrees with bpe_encode_counts; (c)
    the encoding is partitioning-invariant."""
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.bpe import (
        bpe_encode_counts, bpe_encode_ids, bpe_train, bpe_vocab)

    texts = ["low lower lowest", "new newer newest", "low new low",
             "wide widest", "newest lowest new"] * 4
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df)
    merges = bpe_train(ds, "text", num_merges=10)
    vocab = bpe_vocab(ds, "text", merges)
    inv = {i: s for s, i in vocab.items()}

    outs = []
    for parts in (2, 5):
        enc = (bpe_encode_ids(rd.from_pandas(df).repartition(parts), "text",
                              "doc_id", merges, vocab)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(enc)
    a, b = outs
    assert a["n_tokens"].tolist() == b["n_tokens"].tolist()
    assert [list(t) for t in a["token_ids"]] == [list(t) for t in b["token_ids"]]

    for i, text in enumerate(texts):
        decoded = "".join(inv[t] for t in a["token_ids"].iloc[i])
        assert decoded.replace("</w>", " ").strip() == text
    counts = (bpe_encode_counts(ds, "text", "doc_id", merges)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert counts["n_tokens"].tolist() == a["n_tokens"].tolist()


def test_bpe_encode_ids_unknown_symbol_raises(ray_session):
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.bpe import (
        bpe_encode_ids, bpe_train, bpe_vocab)

    df = pd.DataFrame({"doc_id": np.asarray([0], np.int64),
                       "text": ["abc abd"]})
    ds = rd.from_pandas(df)
    merges = bpe_train(ds, "text", num_merges=2)
    vocab = bpe_vocab(ds, "text", merges)
    drifted = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.asarray([0], np.int64), "text": ["xyz"]}))
    with pytest.raises(Exception, match="not in vocab"):
        bpe_encode_ids(drifted, "text", "doc_id", merges, vocab).to_pandas()
