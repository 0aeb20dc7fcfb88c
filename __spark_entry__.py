"""Driver contract for the spark-graft builder (PySpark target).

The correctness gate runs each ``queries()[name]`` at sf=0.01 against the
matching ``oracle_sql()[name]`` in DuckDB (row-count + schema +
order-insensitive value-hash).

Design note: the gate queries run through the REAL engine — the analyzer
UDF, dense docID assignment, FOR/VByte posting blocks, term/field stats —
over the driver's ``documents`` table (treated as a single-field corpus:
``doc_id`` is already the dense docID).  BM25 gate scores use the exact
integer tf/df/dl from the decoded index with double-precision math so
DuckDB can reproduce them bit-stably; the Lucene float32/quantized-norm
scoring path is separately locked by the pytest suite (rank-identity vs
the numpy oracle and a Java float32 cross-check in
tests/test_smallfloat.py).  The quantized norm bytes ARE gate-checked
(`doc_norm_bytes`, via a CASE built from floatToByte315 semantics).
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark.analysis.analyzer import ENGLISH_STOP_WORDS
from lucene_solr_spark.index.builder import BuildConfig, build_index
from lucene_solr_spark.oracle.smallfloat import norm_bytes_for_lengths

K1, B = 1.2, 0.75
_GATE_ROOT = os.environ.get("SPARK_GRAFT_GATE_DIR", "/tmp/lss_gate_index")

_STOPS_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

# DuckDB tokenization of the documents corpus (pure [a-z0-9 ] text, so
# whitespace split == the engine's UAX#29-subset analyzer)
_TOK_CTE = f"""
tok AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> '' AND length(t) <= 255 AND t NOT IN ({_STOPS_SQL})
),
tf AS (SELECT doc_id, term, COUNT(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dls AS (
  SELECT d.doc_id, COALESCE(x.dl, 0)::INT AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id) x USING (doc_id)
),
fs AS (
  SELECT SUM(CASE WHEN dl > 0 THEN 1 ELSE 0 END)::BIGINT AS doc_count,
         SUM(dl)::BIGINT AS sttf
  FROM dls
),
ts AS (SELECT term, COUNT(*)::BIGINT AS doc_freq, SUM(tf)::BIGINT AS ttf
       FROM tf GROUP BY term)
"""


def _norm_byte_case_sql() -> str:
    """CASE expression mapping dl -> Lucene norm byte (floatToByte315 of
    1/sqrt(dl)), exact for dl in [0, 4096]."""
    dl = np.arange(1, 4097)
    nb = norm_bytes_for_lengths(dl)
    parts = ["CASE WHEN dl = 0 THEN 0"]
    start, cur = 1, int(nb[0])
    for i in range(1, dl.size):
        if int(nb[i]) != cur:
            parts.append(f"WHEN dl BETWEEN {start} AND {int(dl[i - 1])} THEN {cur}")
            start, cur = int(dl[i]), int(nb[i])
    parts.append(f"WHEN dl BETWEEN {start} AND 4096 THEN {cur}")
    parts.append("END")
    return " ".join(parts)


# --------------------------------------------------------------- engine


def _documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select(
            F.format_string("doc%012d", F.col("doc_id")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("doc").alias("role"),
            F.col("text"),
            F.lit("none").alias("tool"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
        )
    )


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or resume) the gate index for a testdata dir; idempotent."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    idx = os.path.join(_GATE_ROOT, tag)
    from lucene_solr_spark.index import store

    if not store.stage_committed(idx, "lineage"):
        build_index(
            spark,
            _documents_as_transcripts(spark, sf_dir),
            idx,
            BuildConfig(n_buckets=4, k1=K1, b=B),
        )
    return idx


def _decoded_postings(spark: SparkSession, idx: str, terms: list[str]) -> DataFrame:
    """DF(term, doc_id, tf int) decoded from the index blocks for terms."""
    import pandas as pd

    from lucene_solr_spark.index.builder import term_bucket
    from lucene_solr_spark.index.codec import decode_block

    n_buckets = 4
    buckets = sorted({term_bucket(t, n_buckets) for t in terms})
    post = (
        spark.read.parquet(os.path.join(idx, "postings"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(sorted(terms)))
        .select("term", "salt", "block_id", "kind", "first_doc", "doc_count",
                "payload")
    )

    def dec(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                docs, tfs = decode_block(
                    dict(kind=r.kind, payload=r.payload, doc_count=r.doc_count,
                         first_doc=r.first_doc, block_id=r.block_id)
                )
                outs.append(pd.DataFrame(
                    {"term": r.term, "doc_id": docs, "tf": tfs.astype("int32")}
                ))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return post.mapInPandas(dec, "term string, doc_id long, tf int")


def _bm25_base(spark: SparkSession, sf_dir: str, terms: list[str]) -> DataFrame:
    """Per (term, doc) double-precision BM25 partial scores from the index:
    DF(term, doc_id, score double) using exact tf/df/dl/docCount."""
    idx = _ensure_index(spark, sf_dir)
    tp = _decoded_postings(spark, idx, terms)
    ts = (
        spark.read.parquet(os.path.join(idx, "term_stats"))
        .filter(F.col("term").isin(terms))
        .select("term", "doc_freq")
    )
    fs = spark.read.parquet(os.path.join(idx, "field_stats")).collect()[0]
    dc = int(fs["doc_count"])
    avgdl = float(fs["sum_total_term_freq"]) / dc
    dl = spark.read.parquet(os.path.join(idx, "docmap")).select("doc_id", "dl")
    scored = (
        tp.join(F.broadcast(ts), "term")
        .join(dl, "doc_id")
        .withColumn(
            "score",
            F.log(F.lit(1.0) + (F.lit(dc) - F.col("doc_freq") + 0.5)
                  / (F.col("doc_freq") + 0.5))
            * F.lit(K1 + 1.0)
            * F.col("tf").cast("double")
            / (
                F.col("tf").cast("double")
                + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .select("term", "doc_id", "score")
    )
    return scored


_BM25_SQL_SCORE = (
    f"ln(1.0 + (fs.doc_count - ts.doc_freq + 0.5) / (ts.doc_freq + 0.5)) "
    f"* {K1 + 1.0} * tf "
    f"/ (tf + {K1} * ({1.0 - B} + {B} * dl / (fs.sttf * 1.0 / fs.doc_count)))"
)


def _bm25_term_sql(term: str) -> str:
    return f"""
WITH {_TOK_CTE}
SELECT doc_id, ROUND(score, 4) AS score FROM (
  SELECT tf.doc_id, {_BM25_SQL_SCORE} AS score
  FROM tf JOIN ts USING (term) JOIN dls USING (doc_id), fs
  WHERE tf.term = '{term}'
) ORDER BY score DESC, doc_id LIMIT 10
"""


# --------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end index build + boolean BM25 top-10 on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    scored = _bm25_base(spark, sf_dir, ["batch", "query"])
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score").alias("s"), F.count("*").alias("n"))
        .filter(F.col("n") == 2)  # batch AND query
        .select("doc_id", F.round(F.col("s"), 4).alias("score"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def term_stats(spark, sf):
        idx = _ensure_index(spark, sf)
        return spark.read.parquet(os.path.join(idx, "term_stats")).select(
            "term", "doc_freq", "total_term_freq"
        )

    def field_stats(spark, sf):
        idx = _ensure_index(spark, sf)
        return spark.read.parquet(os.path.join(idx, "field_stats")).select(
            "doc_count", "sum_total_term_freq", "max_doc"
        )

    def doc_lengths(spark, sf):
        idx = _ensure_index(spark, sf)
        return spark.read.parquet(os.path.join(idx, "docmap")).select(
            "doc_id", "dl"
        )

    def doc_norm_bytes(spark, sf):
        idx = _ensure_index(spark, sf)
        return spark.read.parquet(os.path.join(idx, "docmap")).select(
            "doc_id", "norm_byte"
        )

    def bm25_term_hi(spark, sf):
        s = _bm25_base(spark, sf, ["batch"])
        return (
            s.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def bm25_term_rare(spark, sf):
        s = _bm25_base(spark, sf, ["dup"])
        return (
            s.select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id", F.round("score", 4).alias("score"))
        )

    def bm25_and(spark, sf):
        s = _bm25_base(spark, sf, ["batch", "query"])
        return (
            s.groupBy("doc_id")
            .agg(F.sum("score").alias("raw"), F.count("*").alias("n"))
            .filter(F.col("n") == 2)
            .orderBy(F.desc("raw"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id", F.round("raw", 4).alias("score"))
        )

    def bm25_or(spark, sf):
        s = _bm25_base(spark, sf, ["batch", "dup"])
        return (
            s.groupBy("doc_id")
            .agg(F.sum("score").alias("raw"))
            .orderBy(F.desc("raw"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id", F.round("raw", 4).alias("score"))
        )

    def bm25_mixed(spark, sf):
        # (batch OR dup) AND query
        s = _bm25_base(spark, sf, ["batch", "dup", "query"])
        left = (
            s.filter(F.col("term").isin(["batch", "dup"]))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("s_or"))
        )
        right = s.filter(F.col("term") == "query").select(
            "doc_id", F.col("score").alias("s_q")
        )
        return (
            left.join(right, "doc_id")
            .withColumn("raw", F.col("s_or") + F.col("s_q"))
            .orderBy(F.desc("raw"), F.asc("doc_id"))
            .limit(10)
            .select("doc_id", F.round("raw", 4).alias("score"))
        )

    def facet_top_terms(spark, sf):
        idx = _ensure_index(spark, sf)
        return (
            spark.read.parquet(os.path.join(idx, "term_stats"))
            .orderBy(F.desc("doc_freq"), F.asc("term"))
            .limit(20)
            .select("term", "doc_freq")
        )

    def prefix_expand(spark, sf):
        # PrefixQuery expansion against the term dictionary
        idx = _ensure_index(spark, sf)
        return (
            spark.read.parquet(os.path.join(idx, "term_stats"))
            .filter(F.col("term").startswith("s"))
            .select("term", "doc_freq")
        )

    def term_in_set_count(spark, sf):
        idx = _ensure_index(spark, sf)
        tp = _decoded_postings(spark, idx, ["batch", "dup", "key"])
        return tp.agg(F.countDistinct("doc_id").alias("n_docs"))

    def and_membership(spark, sf):
        # BooleanQuery FILTER semantics: matching docIDs, no scores
        idx = _ensure_index(spark, sf)
        tp = _decoded_postings(spark, idx, ["batch", "query"])
        return (
            tp.groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n"))
            .filter(F.col("n") == 2)
            .select("doc_id")
        )

    def dedup_exact(spark, sf):
        # exact dedup by content hash (training-data pipeline op)
        d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return (
            d.groupBy(F.md5(F.col("text")).alias("text_hash"))
            .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_doc_id"))
        )

    def text_quality(spark, sf):
        # quality metrics (JVM-side, no UDF): raw/stop token counts
        d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        stops = F.filter(
            toks, lambda x: x.isin(*sorted(ENGLISH_STOP_WORDS))
        )
        return d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(stops).alias("n_stop"),
            F.size(F.array_distinct(toks)).alias("n_uniq"),
        )

    def embedding_topk(spark, sf):
        # brute-force cosine top-k vs vec_id 0 (ANN baseline)
        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        qn = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
        qcol = F.array(*[F.lit(float(x)) for x in q])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), qcol,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        return (
            e.filter(F.col("vec_id") != 0)
            .withColumn("raw", dot / (nrm * F.lit(qn)))
            .orderBy(F.desc("raw"), F.asc("vec_id"))
            .limit(10)
            .select("vec_id", F.round("raw", 4).alias("cosine"))
        )

    return {
        "term_stats": term_stats,
        "field_stats": field_stats,
        "doc_lengths": doc_lengths,
        "doc_norm_bytes": doc_norm_bytes,
        "bm25_term_hi": bm25_term_hi,
        "bm25_term_rare": bm25_term_rare,
        "bm25_and": bm25_and,
        "bm25_or": bm25_or,
        "bm25_mixed": bm25_mixed,
        "facet_top_terms": facet_top_terms,
        "prefix_expand": prefix_expand,
        "term_in_set_count": term_in_set_count,
        "and_membership": and_membership,
        "dedup_exact": dedup_exact,
        "text_quality": text_quality,
        "embedding_topk": embedding_topk,
    }


def oracle_sql() -> dict[str, str]:
    nb_case = _norm_byte_case_sql()
    return {
        "term_stats": f"""
WITH {_TOK_CTE}
SELECT term, doc_freq, ttf AS total_term_freq FROM ts
""",
        "field_stats": f"""
WITH {_TOK_CTE}
SELECT fs.doc_count AS doc_count, fs.sttf AS sum_total_term_freq,
       (SELECT MAX(doc_id) + 1 FROM documents)::BIGINT AS max_doc
FROM fs
""",
        "doc_lengths": f"""
WITH {_TOK_CTE}
SELECT doc_id, dl FROM dls
""",
        "doc_norm_bytes": f"""
WITH {_TOK_CTE}
SELECT doc_id, ({nb_case})::INT AS norm_byte FROM dls
""",
        "bm25_term_hi": _bm25_term_sql("batch"),
        "bm25_term_rare": _bm25_term_sql("dup"),
        "bm25_and": f"""
WITH {_TOK_CTE}
SELECT doc_id, ROUND(raw, 4) AS score FROM (
  SELECT tf.doc_id, SUM({_BM25_SQL_SCORE}) AS raw, COUNT(*) AS n
  FROM tf JOIN ts USING (term) JOIN dls USING (doc_id), fs
  WHERE tf.term IN ('batch', 'query')
  GROUP BY tf.doc_id HAVING COUNT(*) = 2
) ORDER BY raw DESC, doc_id LIMIT 10
""",
        "bm25_or": f"""
WITH {_TOK_CTE}
SELECT doc_id, ROUND(raw, 4) AS score FROM (
  SELECT tf.doc_id, SUM({_BM25_SQL_SCORE}) AS raw
  FROM tf JOIN ts USING (term) JOIN dls USING (doc_id), fs
  WHERE tf.term IN ('batch', 'dup')
  GROUP BY tf.doc_id
) ORDER BY raw DESC, doc_id LIMIT 10
""",
        "bm25_mixed": f"""
WITH {_TOK_CTE},
scored AS (
  SELECT tf.term, tf.doc_id, {_BM25_SQL_SCORE} AS s
  FROM tf JOIN ts USING (term) JOIN dls USING (doc_id), fs
  WHERE tf.term IN ('batch', 'dup', 'query')
)
SELECT doc_id, ROUND(raw, 4) AS score FROM (
  SELECT l.doc_id, l.s_or + r.s AS raw
  FROM (SELECT doc_id, SUM(s) AS s_or FROM scored
        WHERE term IN ('batch','dup') GROUP BY doc_id) l
  JOIN (SELECT doc_id, s FROM scored WHERE term = 'query') r USING (doc_id)
) ORDER BY raw DESC, doc_id LIMIT 10
""",
        "facet_top_terms": f"""
WITH {_TOK_CTE}
SELECT term, doc_freq FROM ts ORDER BY doc_freq DESC, term LIMIT 20
""",
        "prefix_expand": f"""
WITH {_TOK_CTE}
SELECT term, doc_freq FROM ts WHERE term LIKE 's%'
""",
        "term_in_set_count": f"""
WITH {_TOK_CTE}
SELECT COUNT(DISTINCT doc_id)::BIGINT AS n_docs FROM tok
WHERE term IN ('batch', 'dup', 'key')
""",
        "and_membership": f"""
WITH {_TOK_CTE}
SELECT doc_id FROM tf WHERE term IN ('batch', 'query')
GROUP BY doc_id HAVING COUNT(*) = 2
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, COUNT(*)::BIGINT AS cnt,
       MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
""",
        "text_quality": f"""
WITH raw AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE t <> ''
)
SELECT d.doc_id,
       COALESCE(x.n_tokens, 0)::INT AS n_tokens,
       COALESCE(x.n_stop, 0)::INT AS n_stop,
       COALESCE(x.n_uniq, 0)::INT AS n_uniq
FROM documents d LEFT JOIN (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN t IN ({_STOPS_SQL}) THEN 1 ELSE 0 END) AS n_stop,
         COUNT(DISTINCT t) AS n_uniq
  FROM raw GROUP BY doc_id
) x USING (doc_id)
""",
        "embedding_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
sc AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qe),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(q.qe,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, ROUND(raw, 4) AS cosine FROM sc
ORDER BY raw DESC, vec_id LIMIT 10
""",
    }
