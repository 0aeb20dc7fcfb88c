"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All pure built-in-function DataFrame plans (whole-stage codegen; no
Python in the hot path) with formulas simple enough for a SQL oracle to
reproduce exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis.analyzer import ENGLISH_STOP_WORDS

_STOPS = sorted(ENGLISH_STOP_WORDS)

#: BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs
#: (the GPT-2-style pre-tokenizer shape, simplified to the corpus charset)
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def text_features(docs: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts: whitespace tokens, stopword tokens, distinct
    tokens, BPE-ish subword count, char count."""
    toks = _tokens(text_col)
    stops = F.filter(toks, lambda x: x.isin(*_STOPS))
    return docs.select(
        F.col(key_col),
        F.size(toks).alias("n_tokens"),
        F.size(stops).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).alias(
            "n_bpe"
        ),
        F.length(text_col).alias("n_chars"),
    )


def langid(docs: DataFrame, text_col: str = "text",
           key_col: str = "doc_id", threshold: float = 0.08) -> DataFrame:
    """N-gram/stopword language-ID heuristic: English-stopword token ratio
    above `threshold` -> 'en', else 'unk'.  (A production system stacks
    per-language stop/char-n-gram profiles; the operator shape — narrow
    map, no shuffle — is identical.)"""
    toks = _tokens(text_col)
    stops = F.filter(toks, lambda x: x.isin(*_STOPS))
    ratio = F.size(stops) / F.greatest(F.size(toks), F.lit(1))
    return docs.select(
        F.col(key_col),
        F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unk")).alias(
            "lang_pred"
        ),
        F.round(ratio, 4).alias("stop_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length saturation, lexical
    diversity, non-stopword density — the C4/Gopher-style filter
    features, deterministic and SQL-mirrorable."""
    toks = _tokens(text_col)
    n = F.size(toks)
    nz = F.greatest(n, F.lit(1))
    stops = F.size(F.filter(toks, lambda x: x.isin(*_STOPS)))
    uniq = F.size(F.array_distinct(toks))
    score = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + (uniq / nz) * 0.3
        + (F.lit(1.0) - stops / nz) * 0.3
    )
    return docs.select(F.col(key_col), F.round(score, 4).alias("quality"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 over the sorted distinct token set (a
    SortedTokenSet sketch — robust to token order, cheap to join on)."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(key_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "fingerprint"
        ),
    )
