"""Near-real-time incremental indexing via Structured Streaming.

The reference's NRT machinery — SearcherManager / ControlledRealTime
ReopenThread micro-batch visibility of freshly flushed segments
(search/SearcherManager.java, ControlledRealTimeReopenThread.java) and
TopicStream's checkpointed incremental pull
(solr/solrj/.../io/stream/TopicStream.java:76-110) — maps onto
Structured Streaming foreachBatch: every micro-batch of transcript rows
becomes ONE new immutable segment appended with
`index.builder.append_segment` (docBase-offset docIDs, per-segment
stats, manifest publish), and a reopened LocalSearcher sees it — the
segments_N reopen discipline.

Source offsets + the Spark checkpoint directory give exactly-once
segment appends across restarts (the TopicStream checkpoint analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index import store
from ..index.builder import BuildConfig, append_segment, build_index


def index_batch(spark: SparkSession, batch_df: DataFrame, index_dir: str,
                cfg: BuildConfig | None = None) -> None:
    """Index one micro-batch: first batch bootstraps the index (segment
    0), later batches append segments.  Empty batches are skipped."""
    if not batch_df.take(1):
        return
    if not store.stage_committed(index_dir, "lineage"):
        build_index(spark, batch_df, index_dir, cfg)
    else:
        append_segment(spark, batch_df, index_dir, cfg)


def start_incremental_indexing(spark: SparkSession, stream_df: DataFrame,
                               index_dir: str, checkpoint_dir: str,
                               cfg: BuildConfig | None = None,
                               available_now: bool = True):
    """Attach the incremental indexer to a streaming DataFrame of
    transcripts.  Returns the StreamingQuery; with available_now=True it
    drains the source then stops (micro-batch catch-up mode), otherwise
    it runs continuously."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        index_batch(spark, batch_df, index_dir, cfg)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
