"""Autocomplete suggesters over the term dictionary — the
lucene/suggest module's completion role.

Reference semantics:
- AnalyzingSuggester (suggest/.../analyzing/AnalyzingSuggester.java:
  lookup builds an FST keyed by analyzed form with weight as output and
  returns completions ordered by weight DESC, surface form ASC —
  the tie-break is the FST's byte order on the key, :170-186 sorting
  discipline).  Here the dictionary IS the index's term_stats table and
  the weight is the term's doc_freq (SortedInputIterator over a
  DocumentDictionary with a doc-count weight field is the standard
  Solr wiring); an FST is unnecessary — the dictionary is a sorted
  parquet column and a prefix is a RANGE predicate the scan pushes
  down.
- AnalyzingInfixSuggester (analyzing/AnalyzingInfixSuggester.java:
  lookup :560-640) matches the pattern anywhere inside the term, same
  weight-DESC order.  `mode="infix"` implements it as a contains
  filter — a full dictionary scan, but column-pruned to 2 columns and
  distributed.

Spark-first: `suggest_prefix_df` is a pushed-down dictionary scan
(StringStartsWith reaches the parquet reader; term_stats is bucketed
small relative to postings) + TakeOrderedAndProject — no UDF, no
collect of more than k rows.  `suggest_prefix_local` is the serving
twin on pyarrow for the single-process path.
"""

from __future__ import annotations

import os


def suggest_prefix_local(index_dir: str, prefix: str, k: int = 10,
                         field: str = "text",
                         mode: str = "prefix") -> list[tuple[str, int]]:
    """Serving-path completions: pyarrow dictionary scan with the
    prefix pushed as a range predicate, ranked weight (doc_freq) DESC,
    term ASC, trimmed to k."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(index_dir, "term_stats"),
                      format="parquet")
    filt = pc.field("field") == field
    if mode == "prefix":
        # range form of startswith: pushdown-friendly on the sorted
        # dictionary ([prefix, prefix + U+10FFFF))
        filt = filt & (pc.field("term") >= prefix) \
            & (pc.field("term") < prefix + "\U0010ffff")
    elif mode == "infix":
        filt = filt & pc.match_substring(pc.field("term"), prefix)
    else:
        raise ValueError(mode)
    tbl = ds.to_table(columns=["term", "doc_freq"], filter=filt)
    cands = list(zip(tbl["term"].to_pylist(),
                     (int(x) for x in tbl["doc_freq"].to_pylist())))
    cands.sort(key=lambda x: (-x[1], x[0]))
    return cands[:k]


def suggest_prefix_df(spark, index_dir: str, prefix: str, k: int = 10,
                      field: str = "text", mode: str = "prefix"):
    """Distributed completions as a DataFrame(term, doc_freq): the
    prefix predicate is pushed into the parquet scan, the rank is a
    TakeOrderedAndProject (per-partition heaps, driver merge of k)."""
    import pyspark.sql.functions as F

    df = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("field") == field)
    )
    if mode == "prefix":
        df = df.filter(F.col("term").startswith(prefix))
    elif mode == "infix":
        df = df.filter(F.col("term").contains(prefix))
    else:
        raise ValueError(mode)
    return (
        df.select("term", "doc_freq")
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(k)
    )
