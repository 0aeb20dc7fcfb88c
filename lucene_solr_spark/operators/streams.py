"""Solr streaming-expression operators re-expressed as DataFrame combinators.

The reference ships a relational algebra over sorted tuple streams
(solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/*.java);
each combinator below is the Spark-first restatement of one stream
class — declarative DataFrame ops so Catalyst picks the physical plan
(the reference hand-schedules sort-merge vs hash by class choice;
Catalyst cost-picks it).  Citations per function.

All combinators return DataFrames, so they compose exactly like the
reference's wrapped streams:
    rank(rollup(search(...), over=[...], sum_cols=[...]), by=..., n=10)
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def select(df: DataFrame, *cols: str, **renames: str) -> DataFrame:
    """SelectStream (io/stream/SelectStream.java): projection + rename;
    renames are new_name=old_name or new_name=SQL-expression."""
    out = [F.col(c) for c in cols]
    out += [F.expr(src).alias(dst) for dst, src in renames.items()]
    return df.select(*out)


def having(df: DataFrame, cond: str) -> DataFrame:
    """HavingStream (io/stream/HavingStream.java): post-agg predicate."""
    return df.filter(cond)


_METRICS = {
    "sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg,
    "count": F.count,
}


def _metric_cols(metrics: dict[str, Sequence[str]]):
    """metrics: {"sum": ["a","b"], "avg": ["c"], ...} -> agg exprs named
    like Solr's metric identifiers: sum_a, avg_c, count_* ...
    (io/stream/metrics/SumMetric.java etc.)."""
    aggs = []
    for m, cols in metrics.items():
        if m == "count":
            aggs.append(F.count("*").alias("count_rows"))
            continue
        fn = _METRICS[m]
        for c in cols:
            aggs.append(fn(c).alias(f"{m}_{c}"))
    return aggs


def rollup(df: DataFrame, over: Sequence[str],
           **metrics: Sequence[str]) -> DataFrame:
    """RollupStream (io/stream/RollupStream.java) with Sum/Min/Max/Mean/
    Count metrics.  The reference's map_reduce mode (ParallelStream
    hash-partitioned workers + coordinator merge, SQLHandler.java:213-260)
    IS Spark's partial+final hash aggregation — automatic here."""
    return df.groupBy(*over).agg(*_metric_cols(metrics))


def stats(df: DataFrame, **metrics: Sequence[str]) -> DataFrame:
    """StatsStream (io/stream/StatsStream.java): global aggregates without
    streaming rows."""
    return df.agg(*_metric_cols(metrics))


def unique(df: DataFrame, over: Sequence[str]) -> DataFrame:
    """UniqueStream (io/stream/UniqueStream.java): distinct on the sort key."""
    return df.dropDuplicates(list(over))


def rank(df: DataFrame, by: Sequence, n: int) -> DataFrame:
    """RankStream (io/stream/RankStream.java): top-n reorder.  Spark plans
    this as TakeOrderedAndProject — per-partition heaps + driver merge,
    never a full sort (the TopDocs.merge shape)."""
    return df.orderBy(*by).limit(n)


def merge(dfs: Sequence[DataFrame], by: Sequence | None = None) -> DataFrame:
    """MergeStream (io/stream/MergeStream.java): k-way union of streams;
    ordering, when required downstream, is re-established by sort (Spark
    DataFrames carry no inter-partition order)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.orderBy(*by) if by else out


def intersect(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """IntersectStream (io/stream/IntersectStream.java): rows of `left`
    whose key appears in `right` (left_semi join)."""
    return left.join(right.select(*on).distinct(), list(on), "left_semi")


def complement(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """ComplementStream (io/stream/ComplementStream.java): rows of `left`
    whose key does NOT appear in `right` (left_anti join)."""
    return left.join(right.select(*on).distinct(), list(on), "left_anti")


def inner_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               how: str = "inner") -> DataFrame:
    """InnerJoinStream / LeftOuterJoinStream (io/stream/BiJoinStream.java
    family): equi-join of streams sorted on the join key — Spark's
    sort-merge join, chosen by Catalyst for large sides."""
    return left.join(right, list(on), how)


def hash_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              how: str = "inner") -> DataFrame:
    """HashJoinStream (io/stream/HashJoinStream.java): build side fully in
    memory — the broadcast-hash join, with the hint made explicit."""
    return left.join(F.broadcast(right), list(on), how)


def fetch(left: DataFrame, lookup: DataFrame, on: Sequence[str],
          fields: Sequence[str]) -> DataFrame:
    """FetchStream (io/stream/FetchStream.java): batched lookup join that
    decorates tuples with fields fetched by key (broadcast lookup)."""
    return left.join(
        F.broadcast(lookup.select(*on, *fields)), list(on), "left_outer"
    )


def facet(df: DataFrame, by: Sequence[str], metrics: dict[str, Sequence[str]],
          sort: Sequence, limit: int) -> DataFrame:
    """FacetStream / JSON facet pushdown (io/stream/FacetStream.java;
    solr/core/.../search/facet/FacetFieldProcessor*.java): group-by
    top-k buckets with metrics.  Per-shard partial buckets + merger
    (FacetFieldMerger) = Spark partial/final agg + TakeOrdered."""
    return df.groupBy(*by).agg(*_metric_cols(metrics)).orderBy(*sort).limit(limit)


def facet_range(df: DataFrame, col: str, start: float, end: float,
                gap: float, metrics: dict[str, Sequence[str]] | None = None
                ) -> DataFrame:
    """Range facet (solr/core/.../request/SimpleFacets.getFacetRangeCounts
    + search/facet/FacetRange.java): fixed-width buckets
    [start + i*gap, start + (i+1)*gap) over a numeric column, one row
    per NON-EMPTY bucket with its inclusive-lower/exclusive-upper count
    (Solr's default include=lower) plus optional metrics; rows outside
    [start, end) fall out of the facet (no other=before/after buckets —
    callers wanting them add two filters).

    Spark-first: the bucket id is a single arithmetic projection
    (floor((v - start)/gap)) so the whole facet is one partial/final
    hash aggregate — one shuffle of at most ceil((end-start)/gap)
    rows per partition, independent of data size; the [start, end)
    predicate pushes into the scan."""
    v = F.col(col)
    idx = F.floor((v - F.lit(float(start))) / F.lit(float(gap)))
    out = (
        df.filter((v >= float(start)) & (v < float(end)))
        .withColumn("_bidx", idx)
        .groupBy("_bidx")
        .agg(*_metric_cols(metrics or {"count": []}))
        .withColumn(
            "bucket_start",
            (F.lit(float(start))
             + F.col("_bidx").cast("double") * F.lit(float(gap))),
        )
        .drop("_bidx")
    )
    cols = ["bucket_start"] + [c for c in out.columns if c != "bucket_start"]
    return out.select(*cols).orderBy("bucket_start")


def facet_intervals(df: DataFrame, col: str,
                    intervals: Sequence[tuple]) -> DataFrame:
    """Interval facets (solr/core/.../request/IntervalFacets.java —
    facet.interval): counts for ARBITRARY, possibly-overlapping
    intervals with per-end open/closed bounds, each interval given as
    (label, lo, hi, inc_lo, inc_hi) with None for an unbounded end
    (Solr's `[*,b)` syntax).

    Spark-first: Solr counts every interval in ONE DocValues pass; the
    analogue is one aggregate of conditional sums — a single scan, no
    shuffle beyond the final scalar row, any number of intervals."""
    v = F.col(col)
    aggs = []
    for label, lo, hi, inc_lo, inc_hi in intervals:
        cond = v.isNotNull()
        if lo is not None:
            cond = cond & (v >= lo if inc_lo else v > lo)
        if hi is not None:
            cond = cond & (v <= hi if inc_hi else v < hi)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(label)
        )
    wide = df.agg(*aggs)
    # one row per interval, in the caller's order (the reference
    # returns intervals in request order)
    pairs = F.array(*[
        F.struct(F.lit(lbl).alias("interval"),
                 F.col(lbl).alias("count_rows"),
                 F.lit(i).alias("_ord"))
        for i, (lbl, *_rest) in enumerate(intervals)
    ])
    return (
        wide.select(F.explode(pairs).alias("e"))
        .select("e.interval", "e.count_rows", "e._ord")
        .orderBy("_ord")
        .drop("_ord")
    )


def subfacet(df: DataFrame, by: str, sub: str,
             metrics: dict[str, Sequence[str]], limit: int, sub_limit: int,
             sort: Sequence | None = None,
             sub_sort: Sequence | None = None) -> DataFrame:
    """Nested JSON facet (solr/core/.../search/facet/
    FacetFieldProcessor*.java + FacetFieldMerger): top-`limit` buckets of
    `by`, each refined with its top-`sub_limit` buckets of `sub`.

    Spark-first shape: TWO grouped aggregations, not per-parent queries —
    parents via partial/final agg + TakeOrdered, children via one
    (by, sub) agg semi-joined to the surviving parents (broadcast: the
    parent list is <= `limit` rows) and window-ranked within each parent.
    At 100 TB this is two shuffles total, independent of `limit`.

    Returns a flat DataFrame (by, sub, parent_<metric>..., <metric>...)
    — the flattened form of the reference's nested bucket JSON."""
    psort = sort if sort is not None else [F.desc("count_rows"), F.asc(by)]
    parents = facet(df, [by], metrics, psort, limit)
    pm = parents.select(
        by, *[
            F.col(c).alias(f"parent_{c}")
            for c in parents.columns if c != by
        ]
    )
    children = (
        df.join(F.broadcast(parents.select(by)), [by], "left_semi")
        .groupBy(by, sub)
        .agg(*_metric_cols(metrics))
    )
    csort = sub_sort if sub_sort is not None else [
        F.desc("count_rows"), F.asc(sub)
    ]
    w = Window.partitionBy(by).orderBy(*csort)
    sub_top = (
        children.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= sub_limit)
        .drop("_rk")
    )
    return sub_top.join(F.broadcast(pm), [by])


def facet_pivot(df: DataFrame, fields: Sequence[str],
                limits: Sequence[int]) -> DataFrame:
    """facet.pivot (solr/core/.../handler/component/
    PivotFacetProcessor.java:53 + PivotFacetHelper): arbitrary-depth
    decision-tree facet — at each level, the top-`limits[i]` values of
    `fields[i]` WITHIN each surviving parent tuple, counts descending
    then value ascending (Solr's count/index tie order).

    Spark-first shape: one grouped aggregation per LEVEL (never per
    bucket) — level i aggregates on fields[:i+1], semi-joins to the
    surviving level-(i-1) tuples (broadcast: at most prod(limits[:i])
    rows, configuration-sized), and window-ranks within the parent
    tuple.  Depth-many shuffles total, independent of bucket fan-out —
    the reference's per-pivot recursion re-expressed as layered aggs.

    Returns the flattened pivot tree: (level int, <field> columns with
    NULL below the row's level, count_rows long), ordered by the
    pivot's depth-first walk."""
    assert len(fields) == len(limits) and fields
    levels = []
    parents = None
    for i, (fld, lim) in enumerate(zip(fields, limits)):
        keys = list(fields[: i + 1])
        agg = df.groupBy(*keys).agg(F.count("*").alias("count_rows"))
        if parents is not None:
            agg = agg.join(F.broadcast(parents), keys[:-1], "left_semi")
        if i == 0:
            # top level: a global top-k (one TakeOrdered)
            top = agg.orderBy(
                F.desc("count_rows"), F.asc(fld)
            ).limit(lim)
        else:
            w = Window.partitionBy(*keys[:-1]).orderBy(
                F.desc("count_rows"), F.asc(fld)
            )
            top = (
                agg.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= lim)
                .drop("_rk")
            )
        levels.append(top)
        parents = top.select(*keys)
    out = None
    for i, lv in enumerate(levels):
        row = lv.select(
            F.lit(i).alias("level"),
            *[
                (F.col(f) if j <= i else F.lit(None).cast("string"))
                .alias(f)
                for j, f in enumerate(fields)
            ],
            "count_rows",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy(
        *[F.asc_nulls_last(f) for f in fields], F.asc("level")
    )


def group_topk(df: DataFrame, group: Sequence[str], order: Sequence,
               k: int) -> DataFrame:
    """Grouping module two-pass group-top-k
    (lucene/grouping/.../FirstPassGroupingCollector.java,
    SecondPassGroupingCollector.java): top k rows per group — the
    window-rank form; Spark pushes the rank filter into the sort."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
