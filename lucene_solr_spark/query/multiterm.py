"""Multi-term query expansion against the term dictionary.

The reference expands prefix/wildcard/regexp/fuzzy/range queries by
walking the term dictionary with an automaton
(search/AutomatonQuery.java, PrefixQuery.java, WildcardQuery.java,
RegexpQuery.java, FuzzyQuery.java, TermRangeQuery.java) and rewrites
them to a constant-score match over the union of matching terms'
postings (MultiTermQueryConstantScoreWrapper — the 7.0 default
CONSTANT_SCORE_REWRITE).  We expand against the term_stats table (the
term dictionary IS a DataFrame in this design); these helpers are the
shared matching semantics used by the serving engine, the distributed
executor and the numpy oracle, so all three expand identically.

Deviations (documented): RegexpQuery's regex dialect is Lucene's own
(util/automaton/RegExp.java); we use Python `re` full-match.  FuzzyQuery
uses Levenshtein automata with transpositions=true; we compute the same
OSA (restricted Damerau-Levenshtein) distance directly.
"""

from __future__ import annotations

import re


def wildcard_regex(pattern: str) -> "re.Pattern[str]":
    """Translate a Lucene wildcard pattern (* = any run, ? = one char)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out))


def expand_prefix(terms, prefix: str) -> list[str]:
    return sorted(t for t in terms if t.startswith(prefix))


def expand_wildcard(terms, pattern: str) -> list[str]:
    rx = wildcard_regex(pattern)
    return sorted(t for t in terms if rx.fullmatch(t))


def expand_regexp(terms, pattern: str) -> list[str]:
    rx = re.compile(pattern)
    return sorted(t for t in terms if rx.fullmatch(t))


def expand_range(terms, lo: str | None, hi: str | None,
                 incl_lo: bool, incl_hi: bool) -> list[str]:
    def ok(t: str) -> bool:
        if lo is not None and (t < lo or (t == lo and not incl_lo)):
            return False
        if hi is not None and (t > hi or (t == hi and not incl_hi)):
            return False
        return True

    return sorted(t for t in terms if ok(t))


def osa_distance(a: str, b: str, cap: int) -> int:
    """Optimal-string-alignment (restricted Damerau-Levenshtein) distance,
    early-exit above `cap` — FuzzyQuery's transpositions=true metric."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                prev2 is not None
                and i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                v = min(v, prev2[j - 2] + 1)
            cur[j] = v
            row_min = min(row_min, v)
        if row_min > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def expand_fuzzy(terms, query: str, max_edits: int) -> list[str]:
    return sorted(
        t for t in terms
        if abs(len(t) - len(query)) <= max_edits
        and osa_distance(t, query, max_edits) <= max_edits
    )


def expand(node: tuple, terms) -> list[str]:
    """Expand one multi-term node against an iterable of dictionary terms."""
    kind = node[0]
    if kind == "prefix":
        return expand_prefix(terms, node[1])
    if kind == "wildcard":
        return expand_wildcard(terms, node[1])
    if kind == "regexp":
        return expand_regexp(terms, node[1])
    if kind == "fuzzy":
        return expand_fuzzy(terms, node[1], node[2])
    if kind == "range":
        return expand_range(terms, node[1], node[2], node[3], node[4])
    raise ValueError(f"not a multi-term node: {kind}")


MULTI_TERM_KINDS = ("prefix", "wildcard", "regexp", "fuzzy", "range")
