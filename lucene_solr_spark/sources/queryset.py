"""Reference query set (FIXTURES.md §4), modeled on the reference's
benchmark query files (lucene/benchmark/conf/query-terms.txt,
benchmark/.../feeds/ReutersQueryMaker.java:42-65) restricted to the
north-star surface: boolean AND/OR term queries, k=10.

Queries are derived deterministically from the corpus' term->doc_freq
table so every frequency decile is exercised.
"""

from __future__ import annotations


def build_query_set(doc_freqs: dict[str, int]) -> list[tuple[str, str]]:
    """(name, query_text) pairs given the corpus doc_freq table."""
    terms = sorted(doc_freqs, key=lambda t: (-doc_freqs[t], t))
    n = len(terms)

    def pick(frac: float) -> str:
        return terms[min(int(frac * n), n - 1)]

    hi, hi2 = terms[0], terms[1]
    mid, mid2, mid3 = pick(0.40), pick(0.45), pick(0.50)
    low, low2 = pick(0.90), pick(0.95)
    rare = terms[-1]
    absent = "zzzzabsentterm"

    qs: list[tuple[str, str]] = []
    # single terms: high / mid / low / rare / absent
    for i, t in enumerate([hi, hi2, mid, mid2, mid3, low, low2, rare, absent,
                           pick(0.2)]):
        qs.append((f"single_{i}", t))
    # 2-term AND incl. hot AND rare (leapfrog order)
    for i, (a, b) in enumerate(
        [(hi, mid), (hi, rare), (mid, mid2), (low, low2), (hi, hi2),
         (mid, low), (hi, low2), (mid2, mid3), (rare, low), (hi, absent)]
    ):
        qs.append((f"and2_{i}", f"{a} AND {b}"))
    # 3-term AND incl. one df=0 clause
    for i, (a, b, c) in enumerate(
        [(hi, hi2, mid), (hi, mid, low), (mid, mid2, mid3),
         (hi, mid, absent), (hi2, mid2, low2)]
    ):
        qs.append((f"and3_{i}", f"{a} AND {b} AND {c}"))
    # 2-term OR: disjoint and overlapping
    for i, (a, b) in enumerate(
        [(hi, hi2), (hi, rare), (mid, mid2), (low, low2), (rare, absent),
         (hi, mid), (mid, low2), (hi2, mid3), (low, rare), (mid2, absent)]
    ):
        qs.append((f"or2_{i}", f"{a} OR {b}"))
    # 3..5-term OR incl. all-stopword query
    qs.append(("or3_0", f"{hi} OR {mid} OR {low}"))
    qs.append(("or4_0", f"{hi} OR {hi2} OR {mid2} OR {rare}"))
    qs.append(("or5_0", f"{hi} OR {mid} OR {mid2} OR {low} OR {low2}"))
    qs.append(("or3_1", f"{rare} OR {low} OR {absent}"))
    qs.append(("or_stop", "the OR of OR and"))  # empty after analysis
    # mixed, one nesting level
    for i, q in enumerate(
        [
            f"({hi} OR {hi2}) AND {mid}",
            f"({mid} OR {low}) AND {hi}",
            f"({rare} OR {low2}) AND {mid2}",
            f"({hi} OR {rare}) AND {absent}",
            f"({mid} OR {mid2}) AND ({low} OR {low2})",
            f"({hi} OR {mid}) AND {rare}",
            f"({low} OR {rare}) AND {hi}",
            f"({hi2} OR {mid3}) AND {mid}",
            f"({hi} OR {low}) AND ({hi2} OR {mid2})",
            f"({mid3} OR {low2}) AND {hi2}",
        ]
    ):
        qs.append((f"mixed_{i}", q))
    # stop-word interaction: analysis must strip them
    qs.append(("stop_0", f"the {hi}"))
    qs.append(("stop_1", f"{mid} AND of"))
    qs.append(("stop_2", f"(the OR {low}) AND {hi}"))
    return qs
