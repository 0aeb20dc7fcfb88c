"""Streaming analytics over the transcript stream: watermarked
windowed aggregation and stateful exactly-first streaming dedup.

Reference roles:
- ``windowed_counts`` — the DaemonStream + RollupStream rolling-
  metrics deployment (io/stream/DaemonStream.java wraps an inner
  stream re-run on an interval; our restatement is the native
  Structured Streaming form: event-time tumbling windows with a
  watermark bounding state and dropping late data).
- ``streaming_dedup`` — the UpdateStream + SignatureUpdateProcessor
  dedup-on-ingest role (solr/core/.../update/processor/
  SignatureUpdateProcessorFactory.java drops documents whose content
  signature was already indexed): the first row of each content key
  passes, every later arrival — same batch or any later micro-batch —
  is dropped.  State is per-key via ``applyInPandasWithState``
  (GroupState), so the seen-set shards across executors and survives
  micro-batches through the checkpoint, never on the driver.

At 100 TB ingest both are shuffle-once-per-batch plans: the window agg
is a partial/final streaming aggregate with watermark-bounded state,
and the dedup state store is hash-partitioned by the content key (the
same key the exact-dedup batch operator groups on, so batch and
streaming dedup agree)."""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_counts(stream_df: DataFrame, by: str = "role",
                    window: str = "10 minutes",
                    watermark: str = "20 minutes") -> DataFrame:
    """Per-`by` counts in event-time tumbling windows; late rows beyond
    the watermark are dropped and window state is freed once the
    watermark passes the window end."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col(by))
        .agg(F.count("*").alias("count_rows"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            by, "count_rows",
        )
    )


def streaming_dedup(stream_df: DataFrame, key_col: str = "text_sha",
                    keep_cols: tuple[str, ...] = ("conv_id", "turn_idx")
                    ) -> DataFrame:
    """Exactly-first streaming exact dedup on `key_col`: emits one row
    per distinct key (its first arrival, first-in-batch by the input
    order Spark delivers), suppressing duplicates within and across
    micro-batches via per-key GroupState."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} string, "
        + ", ".join(f"{c} string" if c == "conv_id" else f"{c} int"
                    for c in keep_cols)
    )

    def first_only(key, pdfs, state):
        if state.exists:
            # key already emitted in an earlier batch: drain and drop
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is None:
            return
        state.update((1,))
        yield pd.DataFrame({
            key_col: [key[0]],
            **{c: [first[c].iloc[0]] for c in keep_cols},
        })

    return (
        stream_df.select(key_col, *keep_cols)
        .groupBy(key_col)
        .applyInPandasWithState(
            first_only, out_schema, "seen int", "update",
            GroupStateTimeout.NoTimeout,
        )
    )
