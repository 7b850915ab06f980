"""Text-analysis stages over a documents table.

Stages are plain callable INSTANCES (task pool): construction is free (the
regexes/profiles compile once per worker at module import), so the task form
fuses with the upstream read instead of paying actor-pool startup per stage.
"""
from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions import text as T


class TextStats:
    """Per-doc token counts + quality metrics; regexes live at module scope
    (compiled once per worker import — actor-pool friendly)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = T.quality_metrics(batch[self.text_col])
        out.insert(0, self.id_col, batch[self.id_col].to_numpy())
        out["n_bpe_tokens"] = T.bpe_ish_token_count(batch[self.text_col])
        return out


class LangId:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "predicted_lang": T.predict_lang(batch[self.text_col]).to_numpy(),
            }
        )


class Fingerprint:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id", window: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "fingerprint": T.rolling_fingerprint(batch[self.text_col], self.window).to_numpy(),
            }
        )


def text_stats(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(TextStats(), batch_format="pandas", **kw)


def lang_id(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(LangId(), batch_format="pandas", **kw)


def fingerprint(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(Fingerprint(), batch_format="pandas", **kw)
