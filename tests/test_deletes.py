"""Deletes / live docs: tombstones mask results (scores + stats
unchanged, the reference's pre-merge liveDocs semantics), and
compaction applies them permanently with recomputed statistics."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def del_setup(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import BuildConfig, build_index
    from lucene_solr_spark.oracle import LuceneOracle
    from lucene_solr_spark.sources import (
        gen_transcripts_df, gen_transcripts_pdf,
    )

    d = str(tmp_path_factory.mktemp("delidx") / "idx")
    build_index(spark, gen_transcripts_df(spark, n_convs=25, seed=5), d,
                BuildConfig(n_buckets=2))
    pdf = (
        gen_transcripts_pdf(25, seed=5)
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    oracle = LuceneOracle().build(
        list(zip(range(len(pdf)), pdf["text"].tolist())),
        keyword_values={"role": pdf["role"].tolist(),
                        "tool": pdf["tool"].tolist()},
        ts_values=pdf["ts"].tolist(),
    )
    return d, oracle


QUERY = "retry OR deploy OR cache"


def test_tombstones_mask_rank_identically(spark, del_setup):
    from lucene_solr_spark.index.deletes import delete_docs, read_deleted
    from lucene_solr_spark.query.distributed import DistributedSearcher
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.query.parser import parse_query

    d, oracle = del_setup
    # delete the current top-2 hits plus a non-matching doc
    before = LocalSearcher(d).search(QUERY, 5)
    victims = [before[0][0], before[1][0], 0]
    delete_docs(d, victims)
    delete_docs(d, [victims[0]])  # idempotent re-delete
    assert list(read_deleted(d)) == sorted(set(victims))
    oracle.delete(victims)
    node = parse_query(QUERY)
    want = oracle.search(node, 10)
    assert victims[0] not in [x for x, _ in want]
    for s in (LocalSearcher(d), LocalSearcher(d, pruning=False)):
        got = s.search(QUERY, 10)
        assert [(x, np.float32(y)) for x, y in got] == [
            (x, np.float32(y)) for x, y in want
        ]
    got_d = DistributedSearcher(spark, d).search(QUERY, 10)
    assert [(x, np.float32(y)) for x, y in got_d] == [
        (x, np.float32(y)) for x, y in want
    ]
    # searchAfter pages across the tombstones stay gap/duplicate-free
    s = LocalSearcher(d)
    full = s.search(QUERY, k=None)
    p1 = s.search(QUERY, 4)
    p2 = s.search_after(QUERY, p1[-1], 4)
    assert p1 + p2 == full[:8]


def test_distributed_deletes_never_materialize_on_driver(spark, del_setup):
    """The distributed delete mask is a parquet-scan anti-join: the
    tombstone table reaches the plan as a FileScan, never as a
    LocalTableScan built from a driver-side Python list (VERDICT r2
    item 4 — billions of tombstones must not transit the driver)."""
    from lucene_solr_spark.query.distributed import DistributedSearcher

    d, _ = del_setup
    qe = DistributedSearcher(spark, d).search_df(QUERY, 10)._jdf.queryExecution()
    plan = qe.optimizedPlan().toString()
    # the delete mask is a LeftAnti join whose right side is the deletes
    # parquet relation (a doc_id-only scan), never a LocalTableScan of a
    # collected Python list
    assert "Join LeftAnti" in plan
    assert any(
        "Relation [doc_id#" in line and "parquet" in line
        for line in plan.splitlines()
    )
    assert "LocalTableScan" not in plan
    # and the physical scan really reads the deletes/ directory
    assert "deletes" in qe.executedPlan().toString()


def test_compaction_applies_deletes(spark, del_setup, tmp_path):
    from lucene_solr_spark.index.builder import (
        compact_index, read_field_stats, validate_index,
    )
    from lucene_solr_spark.index.deletes import read_deleted
    from lucene_solr_spark.query.engine import LocalSearcher
    from lucene_solr_spark.sources import gen_transcripts_df

    d, oracle = del_setup
    deleted = read_deleted(d)
    assert deleted.size  # runs after the masking test
    out = str(tmp_path / "compacted")
    compact_index(spark, d, out)
    # tombstoned docs are gone from postings and docmap
    import pyarrow.dataset as pads

    docs_left = pads.dataset(
        os.path.join(out, "docmap"), partitioning="hive"
    ).to_table(columns=["doc_id"]).column("doc_id").to_numpy()
    assert not np.intersect1d(docs_left, deleted).size
    # stats reflect survivors only (merge recomputes statistics)
    masked = LocalSearcher(d)
    fs = read_field_stats(out)
    assert fs["doc_count"] < masked.doc_count  # shrank vs pre-merge stats
    # same match SET as the tombstone-masked index (scores legitimately
    # shift with the recomputed stats, membership must not)
    got = {x for x, _ in LocalSearcher(out).search(QUERY, k=None)}
    want = {x for x, _ in masked.search(QUERY, k=None)}
    assert got == want
    # per-row invariant against the FILTERED source
    src = gen_transcripts_df(spark, n_convs=25, seed=5)
    # rebuild the (conv_id, turn_idx) identity of survivors via docmap
    rep = validate_index(
        spark, src.join(
            spark.read.parquet(os.path.join(out, "docmap"))
            .select("conv_id", "turn_idx"),
            ["conv_id", "turn_idx"], "left_semi",
        ), out,
    )
    assert rep["ok"], rep


def test_elevation_never_resurrects_deleted_docs(spark, del_setup):
    """QueryElevationComponent pins only LIVE docs: a tombstoned id in
    the elevation config must not reappear (the reference intersects
    the elevated set with liveDocs at collection time)."""
    from lucene_solr_spark.index.deletes import read_deleted
    from lucene_solr_spark.query.distributed import DistributedSearcher

    d, _oracle = del_setup
    dead = list(read_deleted(d))
    assert dead, "module fixture ran the delete test first"
    ds = DistributedSearcher(spark, d)
    live_pin = [
        r["doc_id"] for r in ds.search_df(QUERY, 3).collect()
    ][:1]
    got = ds.search_elevated_df(
        QUERY, [dead[0]] + live_pin, k=10
    ).collect()
    ids = [r["doc_id"] for r in got]
    assert dead[0] not in ids
    # the live pinned doc still leads the ranking
    assert ids[0] == live_pin[0] and got[0]["elevated"]
