"""NRT incremental indexing: segment appends must be equivalent to a
single batch build (stats identical; docIDs identical when batches are
delivered in corpus order), and the Structured Streaming path must
ingest micro-batches into segments exactly once."""

import os

import numpy as np
import pytest

from lucene_solr_spark.index.builder import (
    BuildConfig, append_segment, build_index, read_field_stats,
)
from lucene_solr_spark.sources import gen_transcripts_df

pytestmark = pytest.mark.spark


def _term_stats_pdf(d):
    import pyarrow.parquet as pq

    return (
        pq.read_table(os.path.join(d, "term_stats"))
        .to_pandas()
        .sort_values(["field", "term"])
        .reset_index(drop=True)
    )


def test_append_segment_equivalence(spark, tmp_path):
    cfg = BuildConfig(n_buckets=4, positions=True)
    full = gen_transcripts_df(spark, n_convs=30, seed=11)

    batch_dir = str(tmp_path / "batch")
    build_index(spark, full, batch_dir, cfg)

    inc_dir = str(tmp_path / "inc")
    b0 = full.filter("conv_id < 'conv00000010'")
    b1 = full.filter("conv_id >= 'conv00000010' AND conv_id < 'conv00000020'")
    b2 = full.filter("conv_id >= 'conv00000020'")
    build_index(spark, b0, inc_dir, cfg)
    append_segment(spark, b1, inc_dir, cfg)
    append_segment(spark, b2, inc_dir, cfg)

    # global stats identical
    assert read_field_stats(batch_dir) == read_field_stats(inc_dir)
    assert _term_stats_pdf(batch_dir).equals(_term_stats_pdf(inc_dir))

    # rank-identical queries (docIDs match: conv-ordered appends reproduce
    # the global (conv_id, turn_idx) order via docBase offsets)
    from lucene_solr_spark.query.engine import LocalSearcher

    s1, s2 = LocalSearcher(batch_dir), LocalSearcher(inc_dir)
    for q in ["retry AND deploy", "cache", "ba*", '"fix test flake"',
              "bakeka OR dupa OR cache"]:
        assert s1.search(q, 10) == s2.search(q, 10), q


def test_streaming_ingest(spark, tmp_path):
    from lucene_solr_spark.streaming import start_incremental_indexing

    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    full = gen_transcripts_df(spark, n_convs=12, seed=5)
    n_total = full.count()
    full.filter("conv_id < 'conv00000006'").coalesce(1).write.parquet(
        os.path.join(src_dir, "f0")
    )
    full.filter("conv_id >= 'conv00000006'").coalesce(1).write.parquet(
        os.path.join(src_dir, "f1")
    )

    idx = str(tmp_path / "nrt_idx")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    q = start_incremental_indexing(
        spark, stream, idx, ckpt, BuildConfig(n_buckets=2)
    )
    q.awaitTermination(120)

    fs = read_field_stats(idx)
    assert fs["max_doc"] == n_total
    segs = sorted(os.listdir(os.path.join(idx, "postings")))
    assert len([s for s in segs if s.startswith("seg=")]) == 2

    # searcher over the union of segments sees every document of a term,
    # regardless of batch arrival order: compare against a batch build
    batch_dir = str(tmp_path / "batch_ref")
    build_index(spark, full, batch_dir, BuildConfig(n_buckets=2))
    from lucene_solr_spark.query.engine import LocalSearcher

    docmaps = {}
    import pyarrow.parquet as pq

    for name, d in [("inc", idx), ("ref", batch_dir)]:
        t = pq.read_table(
            os.path.join(d, "docmap"),
            columns=["doc_id", "conv_id", "turn_idx"],
        ).to_pandas()
        docmaps[name] = dict(
            zip(t["doc_id"], zip(t["conv_id"], t["turn_idx"]))
        )

    s_inc, s_ref = LocalSearcher(idx), LocalSearcher(batch_dir)
    for q_ in ["cache", "retry", "deploy"]:
        got = {
            (docmaps["inc"][d], np.float32(s)) for d, s in s_inc.search(q_, 10000)
        }
        want = {
            (docmaps["ref"][d], np.float32(s)) for d, s in s_ref.search(q_, 10000)
        }
        assert got == want, q_

    # exactly-once: re-running the drained stream appends nothing
    q2 = start_incremental_indexing(
        spark, stream, idx, ckpt, BuildConfig(n_buckets=2)
    )
    q2.awaitTermination(60)
    assert read_field_stats(idx)["max_doc"] == n_total


def test_compaction_equivalence(spark, tmp_path):
    """Compacting a multi-segment index into one segment preserves stats
    and is rank-identical (SegmentMerger semantics, docIDs unchanged)."""
    from lucene_solr_spark.index.builder import compact_index
    from lucene_solr_spark.query.engine import LocalSearcher

    cfg = BuildConfig(n_buckets=4, positions=True, salt_df_threshold=40,
                      salt_target=50)
    full = gen_transcripts_df(spark, n_convs=24, seed=9)
    inc = str(tmp_path / "inc2")
    build_index(spark, full.filter("conv_id < 'conv00000008'"), inc, cfg)
    append_segment(spark, full.filter(
        "conv_id >= 'conv00000008' AND conv_id < 'conv00000016'"), inc)
    append_segment(spark, full.filter("conv_id >= 'conv00000016'"), inc)

    out = str(tmp_path / "compacted")
    compact_index(spark, inc, out)

    assert read_field_stats(inc) == read_field_stats(out)
    assert _term_stats_pdf(inc).equals(_term_stats_pdf(out))
    segs = [s for s in os.listdir(os.path.join(out, "postings"))
            if s.startswith("seg=")]
    assert segs == ["seg=0"]

    s1, s2 = LocalSearcher(inc), LocalSearcher(out)
    for q in ["retry AND deploy", "cache", "ba*", '"fix test flake"',
              "bakeka OR dupa OR cache", "retry -deploy"]:
        assert s1.search(q, 10) == s2.search(q, 10), q


def test_index_batch_idempotent_per_batch_id(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an already-applied
    batch_id (crash after the segment publish, before the Spark
    checkpoint commit) must be a no-op — no duplicate segment, stats
    unchanged (the applied_batches manifest ledger)."""
    from lucene_solr_spark.streaming.nrt import index_batch

    idx = str(tmp_path / "idem")
    b0 = gen_transcripts_df(spark, n_convs=6, seed=21)
    b1 = gen_transcripts_df(spark, n_convs=4, seed=22)
    cfg = BuildConfig(n_buckets=2)
    index_batch(spark, b0, idx, cfg, batch_id=0)
    index_batch(spark, b1, idx, cfg, batch_id=1)
    fs_before = read_field_stats(idx)
    segs_before = sorted(os.listdir(os.path.join(idx, "postings")))
    # replay both batches (at-least-once delivery)
    index_batch(spark, b0, idx, cfg, batch_id=0)
    index_batch(spark, b1, idx, cfg, batch_id=1)
    assert read_field_stats(idx) == fs_before
    assert sorted(os.listdir(os.path.join(idx, "postings"))) == segs_before
    # a replayed bootstrap whose ledger record was lost resumes the
    # build (no-op) instead of appending a duplicate segment
    from lucene_solr_spark.index import store

    m = store.read_manifest(idx)
    m["applied_batches"] = [1]  # simulate: batch 0's record lost
    store.write_manifest(idx, m)
    index_batch(spark, b1, idx, cfg, batch_id=1)  # 1 recorded -> skip
    assert read_field_stats(idx) == fs_before


def test_streaming_windowed_counts(spark, tmp_path):
    """Watermarked tumbling-window counts: with no late data the
    streamed result equals the batch groupBy twin."""
    from lucene_solr_spark.streaming.ops import windowed_counts

    full = gen_transcripts_df(spark, n_convs=8, seed=7)
    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    full.coalesce(1).write.parquet(os.path.join(src, "f0"))
    stream = (
        spark.readStream.schema(full.schema)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        windowed_counts(stream, by="role", window="10 minutes",
                        watermark="20 minutes")
        .writeStream.format("memory").queryName("wc")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("wc")
        .groupBy("win_start", "win_end", "role")
        .agg({"count_rows": "max"})
        .withColumnRenamed("max(count_rows)", "count_rows")
        .orderBy("win_start", "role")
        .collect()
    )
    import pyspark.sql.functions as F

    want = (
        full.groupBy(F.window("ts", "10 minutes").alias("win"), "role")
        .count()
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "role",
                F.col("count").alias("count_rows"))
        .orderBy("win_start", "role")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Exactly-first dedup: a key arriving in batch 0 is suppressed
    when it re-arrives in batch 1 (GroupState persists across
    micro-batches), and in-batch duplicates collapse to one row."""
    import time

    from lucene_solr_spark.streaming.ops import streaming_dedup

    rows0 = [("s1", "c1", 0), ("s2", "c1", 1), ("s1", "c2", 0)]
    rows1 = [("s1", "c3", 0), ("s3", "c3", 1)]
    schema = "text_sha string, conv_id string, turn_idx int"
    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    spark.createDataFrame(rows0, schema).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    stream = (
        spark.readStream.schema(
            spark.createDataFrame(rows0, schema).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory").queryName("dd")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        time.sleep(0.2)
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
            os.path.join(src, "f1")
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["text_sha"], r["conv_id"]) for r in spark.table("dd").collect()
    )
    # s1 emitted once (batch 0), s2 once, s3 once (batch 1);
    # the batch-1 s1 re-arrival is suppressed by state
    assert [k for k, _ in got] == ["s1", "s2", "s3"]
    assert ("s1", "c3") not in got
