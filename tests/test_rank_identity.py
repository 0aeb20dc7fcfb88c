"""Cross-implementation rank identity (TestBoolean2-style, TestBoolean2.
java:257,402): engine top-k docIDs and float32 scores must equal the
numpy oracle on the full reference query set — for both the local
executor (pruning on AND off) and the distributed DataFrame executor."""

import numpy as np
import pytest

from lucene_solr_spark.query.parser import parse_query

pytestmark = pytest.mark.spark

K = 10


def _assert_identical(name, got, want):
    assert len(got) == len(want), f"{name}: hit count {len(got)} != {len(want)}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert gd == wd, f"{name}[{i}]: doc {gd} != {wd}"
        assert np.float32(gs) == np.float32(ws), f"{name}[{i}]: score {gs} != {ws}"


@pytest.fixture(scope="module")
def local_searcher(index_dir):
    from lucene_solr_spark.query.engine import LocalSearcher

    return LocalSearcher(index_dir, pruning=True)


@pytest.fixture(scope="module")
def local_searcher_nopruning(index_dir):
    from lucene_solr_spark.query.engine import LocalSearcher

    return LocalSearcher(index_dir, pruning=False)


def test_local_rank_identity_full_query_set(local_searcher, oracle, query_set):
    for name, qtext in query_set:
        node = parse_query(qtext)
        want = oracle.search(node, K) if node is not None else []
        got = local_searcher.search(qtext, K)
        _assert_identical(name, got, want)


def test_local_pruning_equals_exhaustive(local_searcher, local_searcher_nopruning,
                                         query_set):
    for name, qtext in query_set:
        a = local_searcher.search(qtext, K)
        b = local_searcher_nopruning.search(qtext, K)
        _assert_identical(f"pruning:{name}", a, b)


def test_distributed_rank_identity_sample(spark, index_dir, oracle, query_set):
    from lucene_solr_spark.query.distributed import DistributedSearcher

    ds = DistributedSearcher(spark, index_dir)
    # distributed path is slower per query — cover every query class
    sample = [q for q in query_set if q[0].endswith(("_0", "_1"))]
    for name, qtext in sample:
        node = parse_query(qtext)
        want = oracle.search(node, K) if node is not None else []
        got = ds.search(qtext, K)
        _assert_identical(f"dist:{name}", got, want)


def test_distributed_span_rank_identity(spark, index_dir, local_searcher):
    """Span queries execute through the DistributedSearcher DataFrame
    plan (VERDICT r2 item 1) rank-identically to the local serving path
    — every span shape, including the new contain/within/range ones."""
    from lucene_solr_spark.query.distributed import DistributedSearcher

    ds = DistributedSearcher(spark, index_dir)
    near_rd = ("span_near", [("sterm", "retry"), ("sterm", "deploy")], 3,
               True)
    nodes = [
        near_rd,
        ("span_near", [("sterm", "deploy"), ("sterm", "retry")], 2, False),
        ("span_near", [("sor", ["retry", "cache"]), ("sterm", "deploy")],
         2, True),
        ("span_first", near_rd, 8),
        ("span_not", near_rd, ("sterm", "pipeline"), 1, 2),
        ("span_near", [near_rd, ("sterm", "pipeline")], 5, True),
        ("span_containing", near_rd, ("sterm", "retry")),
        ("span_within",
         ("span_near", [("sterm", "cache"), ("sterm", "miss")], 8, False),
         ("sterm", "cache")),
        ("span_range", near_rd, 1, 12),
    ]
    n_nonempty = 0
    for node in nodes:
        want = local_searcher.search(node, K)
        got = ds.search(node, K)
        n_nonempty += bool(want)
        _assert_identical(f"dist-span:{node[0]}", got, want)
    assert n_nonempty >= 6


def test_various_k(local_searcher, oracle, query_set):
    node = parse_query(query_set[0][1])
    for k in (1, 3, 25, 100, 10_000):
        _assert_identical(
            f"k={k}", local_searcher.search(query_set[0][1], k),
            oracle.search(node, k),
        )
