"""Oracle unit checks against hand-computed Lucene BM25 values."""

import numpy as np

from lucene_solr_spark.oracle import LuceneOracle, NORM_TABLE
from lucene_solr_spark.oracle.smallfloat import norm_byte_for_length


def _hand_score(tf, dl, df, doc_count, avgdl_ratio_norm_byte, k1=1.2, b=0.75):
    idf = np.float32(np.log(1 + (doc_count - df + 0.5) / (df + 0.5)))
    wv = np.float32(idf * np.float32(k1 + 1))
    return wv, idf


def test_tiny_corpus_stats():
    o = LuceneOracle().build(
        [(0, "cat dog"), (1, "cat cat mouse"), (2, "dog"), (3, "")]
    )
    assert o.doc_count == 3  # empty doc has no postings
    assert o.sum_total_term_freq == 6
    assert float(o.avgdl()) == np.float32(2.0)


def test_tiny_corpus_single_term_score():
    o = LuceneOracle().build(
        [(0, "cat dog"), (1, "cat cat mouse"), (2, "dog"), (3, "")]
    )
    # hand computation for 'cat', doc 1 (tf=2, dl=3):
    idf = np.float32(np.log(1 + (3 - 2 + 0.5) / (2 + 0.5)))
    wv = np.float32(idf * np.float32(2.2))
    nb = norm_byte_for_length(3)
    cache = np.float32(1.2) * (
        (np.float32(1) - np.float32(0.75))
        + np.float32(0.75) * NORM_TABLE[nb] / np.float32(2.0)
    )
    expected = np.float32(wv * np.float32(2.0) / (np.float32(2.0) + cache))
    hits = o.search(("term", "cat"), k=10)
    assert hits[0][0] == 1
    assert np.float32(hits[0][1]) == expected


def test_tie_break_doc_id_asc():
    o = LuceneOracle().build(
        [(0, "tie word"), (1, "tie word"), (2, "tie word"), (3, "other")]
    )
    hits = o.search(("term", "tie"), k=2)
    assert [h[0] for h in hits] == [0, 1]
    assert hits[0][1] == hits[1][1]


def test_and_or_semantics():
    o = LuceneOracle().build(
        [(0, "cat dog"), (1, "cat"), (2, "dog"), (3, "cat dog bird")]
    )
    and_hits = o.search(("and", [("term", "cat"), ("term", "dog")]), k=10)
    assert sorted(h[0] for h in and_hits) == [0, 3]
    or_hits = o.search(("or", [("term", "cat"), ("term", "dog")]), k=10)
    assert sorted(h[0] for h in or_hits) == [0, 1, 2, 3]
    # AND score == sum of the term scores (double-accumulated, float cast)
    single_cat = dict(o.search(("term", "cat"), k=10))
    single_dog = dict(o.search(("term", "dog"), k=10))
    for d, s in and_hits:
        assert np.float32(s) == np.float32(
            np.float64(single_cat[d]) + np.float64(single_dog[d])
        )


def test_absent_term_and_empty_query():
    o = LuceneOracle().build([(0, "cat")])
    assert o.search(("term", "zzz"), k=5) == []
    assert o.search(("and", [("term", "cat"), ("term", "zzz")]), k=5) == []
    hits = o.search(("or", [("term", "cat"), ("term", "zzz")]), k=5)
    assert [h[0] for h in hits] == [0]
