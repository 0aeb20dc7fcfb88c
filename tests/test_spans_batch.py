"""spans_batch (vectorized CSR kernels) vs spans.doc_spans (the per-doc
executable spec): span-set AND float32-freq parity over randomized
clause trees covering every shape in the grammar — ordered/unordered
near (incl. nesting), or, first, not (pre/post), containing, within,
position-range."""

from __future__ import annotations

import random

import numpy as np

from lucene_solr_spark.query.spans import doc_spans, span_freq
from lucene_solr_spark.query.spans_batch import (
    batch_doc_spans, batch_span_freqs, empty, from_positions,
)

TERMS = ["a", "b", "c", "d"]


def _random_clause(rng: random.Random, depth: int):
    kinds = ["sterm", "sor", "span_near"]
    if depth > 0:
        kinds += ["span_near", "span_first", "span_not",
                  "span_containing", "span_within", "span_range"]
    kind = rng.choice(kinds)
    if kind == "sterm" or depth >= 3:
        return ("sterm", rng.choice(TERMS))
    if kind == "sor":
        k = rng.randint(1, 3)
        return ("sor", rng.sample(TERMS, k))
    sub = lambda: _random_clause(rng, depth - 1)  # noqa: E731
    if kind == "span_near":
        nsub = rng.randint(2, 3)
        return ("span_near", [sub() for _ in range(nsub)],
                rng.randint(0, 6), rng.random() < 0.5)
    if kind == "span_first":
        return ("span_first", sub(), rng.randint(1, 12))
    if kind == "span_not":
        if rng.random() < 0.5:
            return ("span_not", sub(), sub())
        return ("span_not", sub(), sub(), rng.randint(0, 2),
                rng.randint(0, 2))
    if kind == "span_containing":
        return ("span_containing", sub(), sub())
    if kind == "span_within":
        return ("span_within", sub(), sub())
    return ("span_range", sub(), rng.randint(0, 4), rng.randint(5, 14))


def _random_docs(rng: random.Random, n: int) -> list[dict[str, np.ndarray]]:
    docs = []
    for _ in range(n):
        doclen = rng.randint(0, 18)
        toks = [rng.choice(TERMS[: rng.randint(1, 4)])
                for _ in range(doclen)]
        pos: dict[str, list[int]] = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        docs.append({t: np.asarray(ps, dtype=np.int64)
                     for t, ps in pos.items()})
    return docs


def _check_tree(node, docs) -> int:
    n = len(docs)
    cache = {}

    def term_batch(t):
        bs = cache.get(t)
        if bs is None:
            bs = from_positions([d.get(t) for d in docs], n)
            cache[t] = bs
        return bs

    bs = batch_doc_spans(node, n, term_batch)
    freqs = batch_span_freqs(bs)
    matched = 0
    for j, d in enumerate(docs):
        want = doc_spans(node, lambda t: d.get(t))
        want_sorted = sorted(want) if want else []
        got = bs.doc_list(j)
        assert got == want_sorted, (node, j, d, got, want_sorted)
        wf = span_freq(want_sorted) if want_sorted else np.float32(0.0)
        assert freqs[j] == wf, (node, j, float(freqs[j]), float(wf))
        matched += bool(want_sorted)
    return matched


def test_batch_matches_docspans_randomized():
    rng = random.Random(0xBA7C)
    docs = _random_docs(rng, 80)
    matched = 0
    for _ in range(250):
        node = _random_clause(rng, 2)
        while node[0] == "sterm":  # ensure composite shapes dominate
            node = _random_clause(rng, 2)
        matched += _check_tree(node, docs)
    assert matched > 500  # the sweep exercised real matches


def test_batch_shape_specific_cases():
    rng = random.Random(11)
    docs = _random_docs(rng, 120)
    cases = [
        ("span_near", [("sterm", "a"), ("sterm", "b")], 3, False),
        ("span_near", [("sterm", "a"), ("sterm", "b"), ("sterm", "c")],
         5, False),
        ("span_near", [("sor", ["a", "b"]), ("sterm", "c")], 2, False),
        ("span_near", [("span_near", [("sterm", "a"), ("sterm", "b")],
                        1, True), ("sterm", "c")], 4, True),
        ("span_near", [("span_near", [("sterm", "a"), ("sterm", "b")],
                        2, False), ("sterm", "d")], 3, False),
        ("span_containing",
         ("span_near", [("sterm", "a"), ("sterm", "b")], 4, True),
         ("sterm", "c")),
        ("span_within", ("sterm", "c"),
         ("span_near", [("sterm", "a"), ("sterm", "b")], 4, False)),
        ("span_not", ("span_near", [("sterm", "a"), ("sterm", "b")],
                      3, True), ("sterm", "c"), 1, 1),
        ("span_first", ("span_near", [("sterm", "a"), ("sterm", "b")],
                        2, False), 6),
        ("span_range", ("sor", ["a", "b", "c"]), 2, 9),
    ]
    total = 0
    for node in cases:
        total += _check_tree(node, docs)
    assert total > 40


def test_batch_empty_and_missing_terms():
    docs = [{"a": np.array([0, 3], dtype=np.int64)}, {}]
    n = len(docs)

    def term_batch(t):
        return from_positions([d.get(t) for d in docs], n)

    node = ("span_near", [("sterm", "a"), ("sterm", "zzz")], 5, True)
    bs = batch_doc_spans(node, n, term_batch)
    assert bs.doc_list(0) == [] and bs.doc_list(1) == []
    assert batch_span_freqs(bs).tolist() == [0.0, 0.0]
    assert empty(3).doc_list(2) == []
