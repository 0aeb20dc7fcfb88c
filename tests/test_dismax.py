"""DisjunctionMaxQuery / (e)dismax (query/dismax.py): rank identity vs
the numpy oracle (local pruning on/off + distributed), the reference's
tie-breaker algebra (DisjunctionMaxScorer.java:49-61: score = max +
tie * (sum - max)), and the (E)DisMax parser composition
(DisMaxQParser.java:60-120)."""

import numpy as np
import pytest

from lucene_solr_spark.query.dismax import dismax_node, edismax_node
from lucene_solr_spark.query.parser import QueryParseError

pytestmark = pytest.mark.spark

K = 10


@pytest.fixture(scope="module")
def searchers(index_dir):
    from lucene_solr_spark.query.engine import LocalSearcher

    return (LocalSearcher(index_dir, pruning=True),
            LocalSearcher(index_dir, pruning=False))


def _terms(oracle, n=4):
    return sorted(oracle.postings, key=lambda t: -oracle.postings[t][0].size)[:n]


def _identical(a, b):
    assert len(a) == len(b)
    for (gd, gs), (wd, ws) in zip(a, b):
        assert gd == wd and np.float32(gs) == np.float32(ws)


def _cases(oracle):
    t = _terms(oracle)
    yield dismax_node([("term", t[0]), ("term", t[1])], 0.0)
    yield dismax_node([("term", t[0]), ("term", t[1]), ("term", t[2])], 0.1)
    yield dismax_node(
        [("boost", ("term", t[0]), 2.0), ("term", t[3])], 0.3)
    yield dismax_node([("term", t[1]), ("fterm", "role", "assistant")], 0.5)
    # nested: dismax under a conjunction and with a phrase-free OR child
    yield ("and", [("term", t[0]),
                   dismax_node([("term", t[1]), ("term", t[2])], 0.2)])
    yield ("or", [dismax_node([("term", t[0]), ("term", t[3])], 1.0),
                  ("term", t[2])])


def test_dismax_rank_identity_local(searchers, oracle):
    for node in _cases(oracle):
        want = oracle.search(node, K)
        for s in searchers:
            _identical(s.search(node, K), want)


def test_dismax_rank_identity_distributed(spark, index_dir, oracle):
    from lucene_solr_spark.query.distributed import DistributedSearcher

    ds = DistributedSearcher(spark, index_dir)
    for node in _cases(oracle):
        _identical(ds.search(node, K), oracle.search(node, K))


def test_dismax_tie_algebra(searchers, oracle):
    """tie=0 -> pure per-doc max; tie=1 -> identical to the OR sum;
    single disjunct collapses to the clause itself
    (DisjunctionMaxQuery.rewrite)."""
    s = searchers[0]
    t = _terms(oracle)
    a, b = ("term", t[0]), ("term", t[1])
    assert dismax_node([a], 0.7) == a
    assert dismax_node([], 0.7) == ("matchnone",)
    got_max = dict(s.search(dismax_node([a, b], 0.0), 1000))
    got_or = dict(s.search(("or", [a, b]), 1000))
    got_tie1 = dict(s.search(dismax_node([a, b], 1.0), 1000))
    sa, sb = dict(s.search(a, 1000)), dict(s.search(b, 1000))
    assert set(got_max) == set(sa) | set(sb)
    for d, v in got_max.items():
        assert np.float32(v) == np.float32(
            max(sa.get(d, -np.inf), sb.get(d, -np.inf)))
    for d, v in got_tie1.items():
        assert np.float32(v) == np.float32(got_or[d])


def test_edismax_composition(searchers, oracle):
    """Each user term becomes a DisMax across qf fields with qf boosts;
    terms compose per mm (ExtendedDismaxQParser.java:65 qf handling)."""
    t = _terms(oracle)
    node = edismax_node(f"{t[0]} {t[1]}",
                        qf={"text": 1.0, "role": 0.5}, tie=0.1, mm=2)
    assert node[0] == "and" and len(node[1]) == 2
    for per_term in node[1]:
        assert per_term[0] == "dismax" and per_term[2] == 0.1
        kinds = sorted(c[0] for c in per_term[1])
        assert kinds == ["boost", "term"]  # role carries its 0.5 boost
    # mm=1 -> or; stopword-only terms vanish like the classic parser
    node_or = edismax_node(f"{t[0]} {t[1]}", qf={"text": 1.0}, mm=1)
    assert node_or == ("or", [("term", t[0]), ("term", t[1])])
    assert edismax_node("the and", qf={"text": 1.0}) == ("matchnone",)
    with pytest.raises(QueryParseError):
        edismax_node("x", qf={"nosuch": 1.0})
    # and it executes end-to-end rank-identically
    s = searchers[0]
    _identical(s.search(node, K), oracle.search(node, K))


def test_edismax_phrase_fields(searchers, oracle):
    """pf adds the whole analyzed query as a boosted optional phrase
    (ReqOptSumScorer): the match set is the qf/mm query's, phrase
    matchers get the extra score, and the node evaluates
    rank-identically to the oracle."""
    t = _terms(oracle)
    q = f"{t[0]} {t[1]}"
    node = edismax_node(q, qf={"text": 1.0}, mm=1,
                        pf={"text": 2.0}, ps=1)
    assert node[0] == "reqopt"
    assert node[1] == ("or", [("term", t[0]), ("term", t[1])])
    assert node[2][0] == "boost" and node[2][1][0] == "phrase"
    s = searchers[0]
    _identical(s.search(node, 50), oracle.search(node, 50))
    # match set unchanged vs the bag-of-words query; phrase matchers
    # strictly gain score
    plain = dict(s.search(node[1], 10000))
    with_pf = dict(s.search(node, 10000))
    assert set(plain) == set(with_pf)
    gained = {d for d in with_pf
              if np.float32(with_pf[d]) > np.float32(plain[d])}
    phrase_docs = {d for d, _ in s.search(node[2], 10000)}
    assert gained == phrase_docs and len(gained) > 0
    # single-term query: pf is a no-op
    assert edismax_node(t[0], qf={"text": 1.0}, pf={"text": 2.0}) == (
        "term", t[0])
    with pytest.raises(QueryParseError):
        edismax_node(q, qf={"text": 1.0}, pf={"role": 2.0})
