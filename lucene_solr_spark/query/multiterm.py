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

#: BooleanQuery.maxClauseCount default (search/BooleanQuery.java:43) —
#: rewrites producing more than this many term clauses throw, exactly
#: like BooleanQuery.TooManyClauses.
MAX_CLAUSE_COUNT = 1024


class TooManyClauses(RuntimeError):
    """Raised when a multi-term rewrite exceeds MAX_CLAUSE_COUNT terms
    (BooleanQuery.TooManyClauses, search/BooleanQuery.java:60-75)."""

    def __init__(self, n_seen: int | None = None):
        msg = f"maxClauseCount is set to {MAX_CLAUSE_COUNT}"
        super().__init__(msg)


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


def expand(node: tuple, terms, max_clauses: int | None = -1) -> list[str]:
    """Expand one multi-term node against an iterable of dictionary terms;
    raises TooManyClauses past `max_clauses` matches (BooleanQuery.java:43).
    max_clauses=-1 -> the module MAX_CLAUSE_COUNT; None -> uncapped."""
    if max_clauses == -1:
        max_clauses = MAX_CLAUSE_COUNT
    kind = node[0]
    if kind == "prefix":
        out = expand_prefix(terms, node[1])
    elif kind == "wildcard":
        out = expand_wildcard(terms, node[1])
    elif kind == "regexp":
        out = expand_regexp(terms, node[1])
    elif kind == "fuzzy":
        out = expand_fuzzy(terms, node[1], node[2])
    elif kind == "range":
        out = expand_range(terms, node[1], node[2], node[3], node[4])
    else:
        raise ValueError(f"not a multi-term node: {kind}")
    if max_clauses is not None and len(out) > max_clauses:
        raise TooManyClauses(len(out))
    return out


def literal_prefix(node: tuple) -> str:
    """Longest literal prefix every match of `node` must start with —
    the pushdown key for the term-dictionary scan (the FST seek-prefix
    analogue of Lucene's automaton intersection,
    search/AutomatonQuery.java + util/automaton/CompiledAutomaton)."""
    kind = node[0]
    if kind == "prefix":
        return node[1]
    if kind == "wildcard":
        pat = node[1]
        for i, ch in enumerate(pat):
            if ch in "*?":
                return pat[:i]
        return pat
    if kind == "regexp":
        pat = node[1]
        # a top-level alternation makes any literal prefix unsound
        # ("abc|def": matches need not start with "abc")
        depth, esc = 0, False
        for ch in pat:
            if esc:
                esc = False
                continue
            if ch == "\\":
                esc = True
            elif ch in "([":
                depth += 1
            elif ch in ")]":
                depth = max(0, depth - 1)
            elif ch == "|" and depth == 0:
                return ""
        out = []
        for ch in pat:
            if ch in ".?*+()[]{}|\\^$":
                break
            out.append(ch)
        # the final literal char before a quantifier may be optional
        # (e.g. "ab*" -> prefix "a"); drop the last gathered char if the
        # stop char is a quantifier acting on it
        if out and len(out) < len(pat) and pat[len(out)] in "*?{":
            out.pop()
        return "".join(out)
    return ""


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string greater than every string starting with `prefix`."""
    if not prefix:
        return None
    last = prefix[-1]
    if ord(last) >= 0x10FFFF:
        return None
    return prefix[:-1] + chr(ord(last) + 1)


def expand_from_dataset(node: tuple, dataset,
                        max_clauses: int | None = -1,
                        field: str | None = None) -> list[str]:
    """Expand a multi-term node against the on-disk term dictionary with
    PUSHED-DOWN predicates — the scan never materializes the full
    dictionary in Python (at 10^12-doc scale the dictionary alone would
    OOM the serving process; Lucene walks the FST, we walk parquet
    row groups pruned by min/max term stats).

    - prefix / range / wildcard / regexp: a [lo, hi) range filter derived
      from the literal prefix reaches the parquet reader (row-group
      pruning); the exact per-kind predicate verifies the pruned slice
      batch-by-batch.
    - fuzzy: no order-preserving pushdown exists (edits move the first
      character), so the scan streams record batches of the single
      `term` column and verifies with the OSA metric per batch.

    Raises TooManyClauses past `max_clauses` verified matches.
    """
    import pyarrow.compute as pc

    if max_clauses == -1:
        max_clauses = MAX_CLAUSE_COUNT
    kind = node[0]
    filt = None if field is None else (pc.field("field") == field)

    def _and(expr):
        nonlocal filt
        filt = expr if filt is None else (filt & expr)

    if kind == "range":
        lo, hi, il, ih = node[1], node[2], node[3], node[4]
        if lo is not None:
            _and(pc.field("term") >= lo if il else pc.field("term") > lo)
        if hi is not None:
            _and(pc.field("term") <= hi if ih else pc.field("term") < hi)
    else:
        pref = literal_prefix(node)
        if pref:
            _and(pc.field("term") >= pref)
            up = _prefix_upper(pref)
            if up is not None:
                _and(pc.field("term") < up)

    out: list[str] = []
    scanner = dataset.scanner(columns=["term"], filter=filt)
    for batch in scanner.to_batches():
        if batch.num_rows == 0:
            continue
        terms = batch.column(0).to_pylist()
        out.extend(expand(node, terms, max_clauses=None))
        if max_clauses is not None and len(out) > max_clauses:
            raise TooManyClauses(len(out))
    return sorted(out)


MULTI_TERM_KINDS = ("prefix", "wildcard", "regexp", "fuzzy", "range")
