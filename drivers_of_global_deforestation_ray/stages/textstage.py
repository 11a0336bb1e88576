"""Document enrichment stage: token stats, quality, language-ID, fingerprints.

One ``map_batches`` pass over a documents table adding the text-analytics
columns (SURVEY.md graft operators; kernels in ``functions/text.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..functions.text import (
    langid_batch,
    md5_fingerprints,
    quality_stats,
    rolling_fingerprints,
)

__all__ = ["enrich_documents"]


def enrich_documents(
    ds: Dataset,
    text_col: str = "text",
    langid: bool = True,
    fingerprints: bool = True,
    batch_size: int = 4096,
) -> Dataset:
    def _enrich(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_stats(batch[text_col])
        for k, v in q.items():
            batch[k] = v
        if langid:
            batch["lang_pred"] = langid_batch(batch[text_col])
        if fingerprints:
            batch["fingerprint_md5"] = md5_fingerprints(batch[text_col])
            batch["fingerprint_roll"] = rolling_fingerprints(batch[text_col]).astype(np.uint64)
        return batch

    return ds.map_batches(_enrich, batch_format="pandas", batch_size=batch_size)
