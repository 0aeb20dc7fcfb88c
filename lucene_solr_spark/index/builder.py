"""Distributed inverted-index build (the IndexWriter analogue).

Spark restatement of the reference indexing chain (SURVEY.md §3.1):
partition task = DocumentsWriterPerThread (index/DocumentsWriterPerThread.
java:49 — document-level parallelism with zero coordination); the
term-shuffle + per-group sort = FreqProxTermsWriter.flush term sort +
SegmentMerger (index/FreqProxTermsWriter.java:81-110, SegmentMerger.
java:80-133); the manifest commit = segments_N publish.

Scale design (10^12 turns, SURVEY.md §7):
- docIDs: dense global rank over the stable (conv_id, turn_idx) order via
  range repartition + per-partition counts -> broadcast offsets (two
  narrow passes over a persisted staged table; no single-task sort, no
  zipWithIndex RDD scan).  docIDs are ephemeral build artifacts exactly
  like Lucene's (MergeState docMaps rebase on merge); docmap keeps the
  (conv_id, turn_idx) identity.
- map-side combine: per-doc (term, tf) pairs are produced inside the
  tokenize UDF, so the shuffle moves one row per (doc, distinct term),
  not one per token (the TermsHashPerField in-RAM combine analogue).
- norms travel with postings rows into the term shuffle (+1 byte/posting)
  so blocks are scoring-self-contained and query time needs NO join
  against doc_norms — at 10^12 docs a query-time norms join would be the
  bottleneck.
- hot-term skew: terms with doc_freq > salt_threshold are split into
  doc-range salts (salt = doc_id * n_salts // max_doc), keeping each
  salted sub-list sorted and disjoint, so query-side concat in salt order
  is still a sorted posting list (CompositeIdRouter-style hash routing +
  our explicit salting, SURVEY.md §4.2).
- resume: each stage commits to the manifest; re-runs skip committed
  stages (TopicStream-style checkpointing).
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from ..analysis.analyzer import analyze
from ..oracle.smallfloat import NORM_TABLE, norm_bytes_for_lengths
from .codec import encode_blocks
from . import store

ANALYZED_SCHEMA = (
    "pid int, local_idx long, conv_id string, turn_idx int, dl int, "
    "norm_byte int, text_sha string, terms array<string>, tfs array<int>"
)

POSTINGS_SCHEMA = (
    "term string, salt int, block_id int, kind int, first_doc long, "
    "last_doc long, doc_count int, payload binary, norms_payload binary, "
    "max_tf int, max_score_contrib float, bucket int"
)


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable term -> bucket hash (first 8 bytes of sha1; NOT Python hash(),
    which is per-process salted)."""
    h = hashlib.sha1(term.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % n_buckets


def _term_bucket_series(terms: pd.Series, n_buckets: int) -> pd.Series:
    return terms.map(lambda t: term_bucket(t, n_buckets)).astype("int32")


@dataclass
class BuildConfig:
    n_buckets: int = 16
    partitions: int | None = None  # docid/range partitions; default = shuffle parallelism
    salt_df_threshold: int = 200_000  # doc_freq above which a term is salted
    salt_target: int = 100_000  # target postings per salted sub-list
    k1: float = 1.2
    b: float = 0.75


# --------------------------------------------------------------- stage 1


def _tokenize_batches(batches):
    """mapInPandas kernel: analysis chain + per-doc tf combine + norms.

    Rows arrive sorted by (conv_id, turn_idx) within a range partition;
    local_idx is the row's rank inside the partition (dense docIDs follow
    after the offsets join).  text_sha records the per-turn text hash for
    the per-row invariant check (north_rule: per-turn text equality under
    stable ordering).
    """
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    offset = 0
    for pdf in batches:
        n = len(pdf)
        terms_col, tfs_col, dls = [], [], np.zeros(n, dtype=np.int64)
        for i, text in enumerate(pdf["text"].tolist()):
            toks = analyze(text or "")
            dls[i] = len(toks)
            if toks:
                # map-side combine: (term, tf) pairs, term-sorted for
                # deterministic downstream layout
                uniq: dict[str, int] = {}
                for t in toks:
                    uniq[t] = uniq.get(t, 0) + 1
                items = sorted(uniq.items())
                terms_col.append([t for t, _ in items])
                tfs_col.append([c for _, c in items])
            else:
                terms_col.append([])
                tfs_col.append([])
        out = pd.DataFrame(
            {
                "pid": np.int32(pid),
                "local_idx": np.arange(offset, offset + n, dtype=np.int64),
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].values,
                "dl": dls.astype(np.int32),
                "norm_byte": norm_bytes_for_lengths(dls).astype(np.int32),
                "text_sha": [
                    hashlib.sha1((t or "").encode("utf-8")).hexdigest()
                    for t in pdf["text"].tolist()
                ],
                "terms": terms_col,
                "tfs": tfs_col,
            }
        )
        offset += n
        yield out


def _stage_docmap(spark: SparkSession, transcripts: DataFrame, index_dir: str,
                  cfg: BuildConfig) -> None:
    parts = cfg.partitions or spark.sparkContext.defaultParallelism
    sorted_df = transcripts.repartitionByRange(
        parts, F.col("conv_id"), F.col("turn_idx")
    ).sortWithinPartitions("conv_id", "turn_idx")
    analyzed_local = sorted_df.mapInPandas(_tokenize_batches, ANALYZED_SCHEMA)
    analyzed_local.persist(StorageLevel.MEMORY_AND_DISK)
    # pass 1: per-partition counts -> dense docID offsets (broadcast join)
    counts = {
        r["pid"]: r["cnt"]
        for r in analyzed_local.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, offset long"
        )
    )
    analyzed = (
        analyzed_local.join(offsets_df, "pid")
        .withColumn("doc_id", F.col("offset") + F.col("local_idx"))
        .drop("pid", "local_idx", "offset")
    )
    analyzed.write.mode("overwrite").parquet(os.path.join(index_dir, "analyzed"))
    analyzed_local.unpersist()
    a = spark.read.parquet(os.path.join(index_dir, "analyzed"))
    a.select("doc_id", "conv_id", "turn_idx", "text_sha").write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "docmap"))
    a.select("doc_id", "norm_byte", "dl").write.mode("overwrite").parquet(
        os.path.join(index_dir, "doc_norms")
    )
    store.commit_stage(index_dir, "docmap", {"max_doc": int(acc)})


# --------------------------------------------------------------- stage 2


def _stage_stats(spark: SparkSession, index_dir: str) -> None:
    a = spark.read.parquet(os.path.join(index_dir, "analyzed"))
    # docCount = docs with >=1 posting (Terms.getDocCount semantics);
    # sumTotalTermFreq = total surviving tokens
    fs = a.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("doc_count"),
        F.sum("dl").alias("sum_total_term_freq"),
        (F.max("doc_id") + 1).alias("max_doc"),
    )
    fs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, "field_stats")
    )
    store.commit_stage(index_dir, "field_stats")

    exploded = a.select(
        "doc_id", F.explode(F.arrays_zip("terms", "tfs")).alias("p")
    ).select("doc_id", F.col("p.terms").alias("term"), F.col("p.tfs").alias("tf"))
    ts = exploded.groupBy("term").agg(
        F.count("*").alias("doc_freq"), F.sum("tf").alias("total_term_freq")
    )
    ts.write.mode("overwrite").parquet(os.path.join(index_dir, "term_stats"))
    store.commit_stage(index_dir, "term_stats")


# --------------------------------------------------------------- stage 3


def _encode_group_factory(avgdl: float, doc_count: int, k1: float, b: float,
                          n_buckets: int, hot_df: dict[str, int], max_doc: int):
    """applyInPandas kernel over one (term, salt) group -> encoded blocks.

    max_score_contrib is the exact per-block BM25 upper bound
    weightValue * max(tf/(tf+cache[norm])) — the block-max metadata that
    replaces Lucene's skip lists (SURVEY.md §4.2) and feeds WAND/MaxScore
    pruning.  idf uses the term's GLOBAL doc_freq: hot (salted) terms get
    it from the broadcast salt map; unsalted groups see their full list.
    """
    k1f = np.float32(k1)
    bf = np.float32(b)
    cache = (k1f * ((np.float32(1.0) - bf) + bf * NORM_TABLE / np.float32(avgdl))).astype(np.float32)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        salt = int(pdf["salt"].iloc[0])
        order = np.argsort(pdf["doc_id"].values, kind="stable")
        docs = pdf["doc_id"].values[order].astype(np.int64)
        tfs = pdf["tf"].values[order].astype(np.int64)
        norms = pdf["norm_byte"].values[order].astype(np.uint8)
        df_global = hot_df.get(term, len(docs))
        idf = np.float32(np.log(1 + (doc_count - df_global + 0.5) / (df_global + 0.5)))
        weight_value = np.float32(idf * (k1f + np.float32(1.0)))
        rows = []
        blocks = encode_blocks(docs, tfs)
        freq = tfs.astype(np.float32)
        ratio = (weight_value * (freq / (freq + cache[norms]))).astype(np.float32)
        for blk in blocks:
            s, e = blk["block_id"] * 128, blk["block_id"] * 128 + blk["doc_count"]
            rows.append(
                (
                    term,
                    salt,
                    blk["block_id"],
                    blk["kind"],
                    blk["first_doc"],
                    blk["last_doc"],
                    blk["doc_count"],
                    blk["payload"],
                    norms[s:e].tobytes(),
                    blk["max_tf"],
                    float(ratio[s:e].max()),
                    term_bucket(term, n_buckets),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "term", "salt", "block_id", "kind", "first_doc", "last_doc",
                "doc_count", "payload", "norms_payload", "max_tf",
                "max_score_contrib", "bucket",
            ],
        )

    return encode


def _stage_postings(spark: SparkSession, index_dir: str, cfg: BuildConfig) -> None:
    a = spark.read.parquet(os.path.join(index_dir, "analyzed"))
    fs = spark.read.parquet(os.path.join(index_dir, "field_stats")).collect()[0]
    max_doc = int(fs["max_doc"])
    avgdl = float(
        np.float32(fs["sum_total_term_freq"] / float(fs["doc_count"]))
    ) if fs["doc_count"] else 1.0

    # hot-term salt map (explicit skew handling, north_rule)
    ts = spark.read.parquet(os.path.join(index_dir, "term_stats"))
    hot = (
        ts.filter(F.col("doc_freq") > cfg.salt_df_threshold)
        .select("term", "doc_freq")
        .collect()
    )
    hot_salts = {
        r["term"]: int(np.ceil(r["doc_freq"] / cfg.salt_target)) for r in hot
    }
    hot_df = {r["term"]: int(r["doc_freq"]) for r in hot}
    b_hot = spark.sparkContext.broadcast(hot_salts)

    exploded = a.select(
        "doc_id",
        "norm_byte",
        F.explode(F.arrays_zip("terms", "tfs")).alias("p"),
    ).select(
        "doc_id",
        "norm_byte",
        F.col("p.terms").alias("term"),
        F.col("p.tfs").alias("tf"),
    )

    @F.pandas_udf("int")
    def salt_of(term: pd.Series, doc_id: pd.Series) -> pd.Series:
        hs = b_hot.value
        if not hs:
            return pd.Series(np.zeros(len(term), dtype=np.int32))
        n = term.map(lambda t: hs.get(t, 1)).astype("int64")
        return ((doc_id.astype("int64") * n) // max(max_doc, 1)).astype("int32")

    salted = exploded.withColumn("salt", salt_of(F.col("term"), F.col("doc_id")))
    encode = _encode_group_factory(
        avgdl, int(fs["doc_count"] or 0), cfg.k1, cfg.b, cfg.n_buckets, hot_df, max_doc
    )
    postings = salted.groupBy("term", "salt").applyInPandas(encode, POSTINGS_SCHEMA)
    (
        postings.repartition(max(cfg.n_buckets, 1), "bucket")
        .sortWithinPartitions("term", "salt", "block_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(index_dir, "postings"))
    )
    store.commit_stage(
        index_dir, "postings",
        {"avgdl": avgdl, "n_buckets": cfg.n_buckets, "hot_terms": len(hot_salts)},
    )


# --------------------------------------------------------------- stage 4


def _stage_lineage(spark: SparkSession, index_dir: str, cfg: BuildConfig,
                   elapsed: float) -> None:
    p = spark.read.parquet(os.path.join(index_dir, "postings"))
    lin = (
        p.groupBy("bucket")
        .agg(
            F.min("term").alias("term_range_lo"),
            F.max("term").alias("term_range_hi"),
            F.sum("doc_count").alias("doc_count"),
            F.sum(F.length("payload") + F.length("norms_payload")).alias("bytes"),
        )
        .withColumn("segment_id", F.concat(F.lit("seg-"), F.col("bucket")))
        .withColumn("stage", F.lit("postings"))
        .withColumn("status", F.lit("committed"))
        .withColumn("detail", F.lit(f"build_sec={elapsed:.2f}"))
    )
    lin.write.mode("overwrite").parquet(os.path.join(index_dir, "lineage"))
    store.commit_stage(index_dir, "lineage")


# ----------------------------------------------------------------- main


def build_index(spark: SparkSession, transcripts: DataFrame, index_dir: str,
                cfg: BuildConfig | None = None, resume: bool = True) -> dict:
    """Run the staged build; skips stages already committed when resume=True.

    Returns the final manifest dict.
    """
    cfg = cfg or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.time()
    store.set_params(
        index_dir,
        {"n_buckets": cfg.n_buckets, "k1": cfg.k1, "b": cfg.b,
         "salt_df_threshold": cfg.salt_df_threshold},
    )
    if not (resume and store.stage_committed(index_dir, "docmap")):
        _stage_docmap(spark, transcripts, index_dir, cfg)
    if not (resume and store.stage_committed(index_dir, "term_stats")):
        _stage_stats(spark, index_dir)
    if not (resume and store.stage_committed(index_dir, "postings")):
        _stage_postings(spark, index_dir, cfg)
    if not (resume and store.stage_committed(index_dir, "lineage")):
        _stage_lineage(spark, index_dir, cfg, time.time() - t0)
    return store.read_manifest(index_dir)


def validate_index(spark: SparkSession, transcripts: DataFrame, index_dir: str) -> dict:
    """CheckIndex analogue (index/CheckIndex.java:502-757) + the per-row
    invariant: per-turn text equality under stable (conv_id, turn_idx)
    ordering, via text_sha comparison against the source table."""
    docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
    src = transcripts.select(
        "conv_id", "turn_idx", F.sha1(F.coalesce(F.col("text"), F.lit(""))).alias("src_sha")
    )
    joined = docmap.join(src, ["conv_id", "turn_idx"], "full_outer")
    mismatches = joined.filter(
        F.col("text_sha").isNull()
        | F.col("src_sha").isNull()
        | (F.col("text_sha") != F.col("src_sha"))
    ).count()
    p = spark.read.parquet(os.path.join(index_dir, "postings"))
    bad_blocks = p.filter(
        (F.col("first_doc") > F.col("last_doc")) | (F.col("doc_count") <= 0)
    ).count()
    n_docs = docmap.count()
    dup_ids = n_docs - docmap.select("doc_id").distinct().count()
    return {
        "text_mismatches": int(mismatches),
        "bad_blocks": int(bad_blocks),
        "duplicate_doc_ids": int(dup_ids),
        "n_docs": int(n_docs),
        "ok": mismatches == 0 and bad_blocks == 0 and dup_ids == 0,
    }
