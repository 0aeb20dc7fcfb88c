"""CommonTermsQuery (lucene/queries/.../queries/CommonTermsQuery.java):
split the query terms by document frequency at `max_term_frequency`
(absolute when >= 1, else a fraction of maxDoc, ceil — :159-163) and
compose LOW-frequency terms with `low_occur` and HIGH-frequency terms
with `high_occur` (:168-220 createQuery).  The classic stopword-free
configuration — low MUST + high SHOULD — makes rare terms required
while common ("the", "a") terms only contribute score, without a
stopword list.

Spark-first: this is a pure REWRITE to the engine's existing boolean
algebra — ("reqopt", low-AND, high-OR) — so both searchers execute it
through their normal plans (no new scorer); absent terms land in the
low/required group exactly like the reference's null-TermContext path
(a required absent term kills the query)."""
from __future__ import annotations

import math


def common_terms_node(doc_freqs: dict[str, int], max_doc: int,
                      terms: list[str],
                      max_term_frequency: float = 0.01,
                      low_occur: str = "must",
                      high_occur: str = "should"):
    """Build the rewritten query node.  `doc_freqs` maps term ->
    docFreq (missing = absent, df 0)."""
    assert low_occur in ("must", "should")
    assert high_occur in ("must", "should")
    cutoff = (
        max_term_frequency if max_term_frequency >= 1.0
        else math.ceil(max_term_frequency * max_doc)
    )
    low = [t for t in terms if doc_freqs.get(t, 0) <= cutoff]
    high = [t for t in terms if doc_freqs.get(t, 0) > cutoff]

    def group(ts, occur):
        nodes = [("term", t) for t in ts]
        if len(nodes) == 1:
            return nodes[0]
        return ("and" if occur == "must" else "or", nodes)

    if not high:
        return group(low, low_occur) if low else ("matchnone",)
    if not low:
        # conjunction rewrite: with no low-freq group the reference
        # forces highFreqOccur to MUST "to prevent slow queries"
        # (buildQuery :180-188, highFreqMinShouldMatch == 0 path)
        return group(high, "must")
    # both groups present: the outer composition is ALWAYS
    # (lowFreqQuery MUST, highFreqQuery SHOULD) — buildQuery
    # :191-198 — so at least one low-freq term is required even when
    # low_occur == 'should'; each group keeps its own occur inside
    return ("reqopt", group(low, low_occur), group(high, high_occur))
