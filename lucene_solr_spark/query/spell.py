"""Spell-check suggestions — the DirectSpellChecker role.

Reference semantics (suggest/.../spell/DirectSpellChecker.java):
candidates are dictionary terms within maxEdits OSA edits of the query
(FuzzyTermsEnum), present in the index (df > 0), excluding the query
term itself; score = 1 - dist / min(len(query), len(candidate))
(LuceneLevenshteinDistance.java:70 — the OSA DP with transposition);
candidates below `accuracy` (default 0.5) are dropped; the result is
ordered score DESC, then docFreq DESC, then term ASC
(SuggestWordScoreComparator.java applied through
Collections.reverseOrder, DirectSpellChecker.java:360-380) and trimmed
to k.

Spark-first: the term dictionary is scanned with PUSHED-DOWN predicates
(length window |len(t) - len(q)| <= maxEdits — an edit changes length
by at most one — plus the levenshtein <= 2*OSA JVM-side prefilter from
the fuzzy-query path); only the surviving handful of candidates reach
the exact OSA verify.
"""

from __future__ import annotations

import os

from .multiterm import osa_distance


def _rank(cands: list[tuple[str, int]], query: str, k: int,
          max_edits: int, accuracy: float) -> list[tuple[str, float, int]]:
    """Exact-verify + rank candidate (term, doc_freq) pairs."""
    out = []
    for t, df in cands:
        if t == query or df <= 0:
            continue
        d = osa_distance(query, t, max_edits)
        if d > max_edits:
            continue
        score = 1.0 - d / min(len(query), len(t))
        if score < accuracy:
            continue
        out.append((t, score, int(df)))
    out.sort(key=lambda x: (-x[1], -x[2], x[0]))
    return out[:k]


def suggest_local(index_dir: str, query: str, k: int = 5,
                  max_edits: int = 2, accuracy: float = 0.5,
                  field: str = "text") -> list[tuple[str, float, int]]:
    """Serving-path suggestions: pyarrow dictionary scan with a pushed
    length-window predicate, exact OSA verify on the survivors."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "term_stats"),
                      format="parquet")
    ln = pc.utf8_length(pc.field("term"))
    filt = (
        (pc.field("field") == field)
        & (ln >= len(query) - max_edits)
        & (ln <= len(query) + max_edits)
    )
    tbl = ds.to_table(columns=["term", "doc_freq"], filter=filt)
    return _rank(
        list(zip(tbl["term"].to_pylist(), tbl["doc_freq"].to_pylist())),
        query, k, max_edits, accuracy,
    )


def suggest_df(spark, index_dir: str, query: str, k: int = 5,
               max_edits: int = 2, accuracy: float = 0.5,
               field: str = "text"):
    """Distributed suggestions as a DataFrame(term, score double,
    doc_freq): dictionary scan with length-window + levenshtein
    prefilter pushed JVM-side; the bounded candidate set is
    OSA-verified and ranked with the reference comparator."""
    import pyspark.sql.functions as F

    cand = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(
            (F.col("field") == field)
            & (F.length("term") >= len(query) - max_edits)
            & (F.length("term") <= len(query) + max_edits)
            & (F.levenshtein("term", F.lit(query)) <= 2 * max_edits)
        )
        .select("term", "doc_freq")
        .collect()
    )
    ranked = _rank(
        [(r["term"], int(r["doc_freq"])) for r in cand],
        query, k, max_edits, accuracy,
    )
    return spark.createDataFrame(
        ranked or [], "term string, score double, doc_freq long"
    )
