"""DisjunctionMaxQuery + (e)dismax query building.

``dismax_node`` is the scoring primitive
(search/DisjunctionMaxQuery.java:47-63 / DisjunctionMaxScorer.java:49-61):
a doc matches when ANY disjunct matches, and scores

    max(clause scores) + tieBreakerMultiplier * (sum - max)

``edismax_node`` is the user-facing surface of the (Extended)DisMax
query parsers (solr/core/.../search/DisMaxQParser.java:60-120,
ExtendedDismaxQParser.java:65): the user query is analyzed, each term
becomes a DisjunctionMax across the ``qf`` fields (each field's clause
carrying its qf boost), and the per-term DisMaxes combine with
minimum-match semantics (mm) — the "search the way Solr does by
default" composition.

Spark-first: both are pure REWRITES into the engines' existing node
algebra — dismax is one new scorer node evaluated as
groupBy(doc_id).agg(max, clause-order sum) distributed-side and a
scatter max/sum locally; the field/boost machinery reuses the existing
``fterm`` / ``boost`` nodes, so no new scan shape is introduced.
"""
from __future__ import annotations

from ..analysis import analyze_query_terms
from .parser import DEFAULT_FIELDS, QueryParseError


def dismax_node(clauses: list, tie: float = 0.0):
    """("dismax", clauses, tie) with the reference's rewrites: zero
    disjuncts match nothing, a single disjunct IS the query
    (DisjunctionMaxQuery.rewrite — the tie multiplier never applies
    with one clause)."""
    clauses = [c for c in clauses if c is not None and c[0] != "matchnone"]
    if not clauses:
        return ("matchnone",)
    if len(clauses) == 1:
        return clauses[0]
    return ("dismax", clauses, float(tie))


def edismax_node(user_query: str, qf: dict[str, float],
                 tie: float = 0.0, mm: int = 1):
    """Parse `user_query` the (e)dismax way: analyzer over the raw
    words, one DisjunctionMax per surviving term across the qf fields,
    composed with minimumNumberShouldMatch = mm (DisMaxQParser's
    mm-driven BooleanQuery; mm >= #terms degenerates to AND).  Text
    fields analyze the term; keyword fields match it verbatim
    (lowercased, the reference's field-type discipline)."""
    for f in qf:
        if f not in DEFAULT_FIELDS:
            raise QueryParseError(f"unknown qf field {f!r}")
    words = [w for w in user_query.split() if w]
    per_term = []
    for w in words:
        disjuncts = []
        for f, boost in qf.items():
            if DEFAULT_FIELDS[f] == "text":
                terms = analyze_query_terms(w)
                if not terms:
                    continue
                base = (
                    ("term", terms[0]) if len(terms) == 1
                    else ("or", [("term", t) for t in terms])
                )
            elif DEFAULT_FIELDS[f] == "keyword":
                base = ("fterm", f, w.lower())
            else:  # point fields are not scoreable qf targets
                continue
            disjuncts.append(
                base if float(boost) == 1.0 else ("boost", base, float(boost))
            )
        node = dismax_node(disjuncts, tie)
        if node[0] != "matchnone":
            per_term.append(node)
    if not per_term:
        return ("matchnone",)
    if len(per_term) == 1:
        return per_term[0]
    mm = max(1, min(int(mm), len(per_term)))
    if mm == len(per_term):
        return ("and", per_term)
    if mm == 1:
        return ("or", per_term)
    return ("msm_or", mm, per_term)
