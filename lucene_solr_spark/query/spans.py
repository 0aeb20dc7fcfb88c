"""Span-query matching — the NearSpansOrdered/Unordered executable spec.

Exact restatement of the reference's span enumeration over one document
(search/spans/):

- a term's spans are (pos, pos+1) with width 0 (TermSpans.java:110);
- SpanOrQuery merges sub-span lists in (start, end) order
  (SpanOrQuery.java + SpanPositionQueue / positionsOrdered,
  NearSpansUnordered.java:182-187);
- NearSpansOrdered (NearSpansOrdered.java:95-125): iterate the FIRST
  clause's spans; for each, stretchToOrder advances every later clause
  until its start >= the previous clause's end, accumulating
  matchWidth = sum of gaps (start_i - prevEnd); a match is recorded
  when matchWidth <= slop (non-overlapping, in order);
- NearSpansUnordered (NearSpansUnordered.java:193-240): cells in a
  priority queue by (start, end); a state matches when
  maxEnd - minStart - totalSpanLength <= slop; enumeration advances
  the min cell between matches; the SCORING width of a match is
  maxEndCell.start - minCell.start (NearSpansUnordered.java:257-259 —
  deliberately different from the slop criterion);
- SpanScorer (SpanScorer.java:90-110): freq is the float32 sum of
  computeSlopFactor(width) = 1/(1+width) over all enumerated matches;
  BM25 then scores that freq with the summed idf of the query's
  DEDUPLICATED terms (SpanWeight.buildSimWeight — a term map, unlike
  PhraseQuery's duplicate-keeping termStats array).

Like multiterm/sloppy, this module is the shared matching semantics for
the serving engine and the numpy oracle.  Deviation: on exact
(start, end) ties between cells the reference's queue order is
insertion-dependent; we break ties by clause index.
"""

from __future__ import annotations

import heapq

import numpy as np

Span = tuple[int, int, int]  # (start, end, width); term spans: (p, p+1, 0)

#: every node kind evaluated by doc_spans
SPAN_KINDS = (
    "sterm", "sor", "span_near", "span_first", "span_not",
    "span_containing", "span_within", "span_range",
)


def term_spans(positions: np.ndarray) -> list[Span]:
    return [(int(p), int(p) + 1, 0) for p in positions]


def or_spans(span_lists: list[list[Span]]) -> list[Span]:
    """SpanOrQuery: merged sub-span lists in (start, end) order."""
    out: list[Span] = []
    for sl in span_lists:
        out.extend(sl)
    out.sort()
    return out


def near_ordered(sub: list[list[Span]], slop: int) -> list[Span]:
    """Every NearSpansOrdered match in one doc as (matchStart, matchEnd,
    matchWidth) (each sub list sorted by (start, end), all non-empty)."""
    n = len(sub)
    idx = [0] * n
    out: list[Span] = []
    L0 = sub[0]
    while idx[0] < len(L0):
        # stretchToOrder (NearSpansOrdered.java:100-121)
        match_start = L0[idx[0]][0]
        prev_end = L0[idx[0]][1]
        width = 0
        exhausted = False
        for i in range(1, n):
            li = sub[i]
            while idx[i] < len(li) and li[idx[i]][0] < prev_end:
                idx[i] += 1
            if idx[i] == len(li):
                exhausted = True
                break
            width += li[idx[i]][0] - prev_end
            prev_end = li[idx[i]][1]
        if exhausted:
            break
        if width <= slop:
            out.append((match_start, prev_end, width))
        idx[0] += 1
    return out


def near_unordered(sub: list[list[Span]], slop: int) -> list[Span]:
    """Every NearSpansUnordered match state as (minCell.start,
    maxEndCell.end, maxEndCell.start - minCell.start) — the reference
    scoring width deliberately differs from the slop criterion
    (NearSpansUnordered.java:193-259)."""
    n = len(sub)
    idx = [0] * n
    # each cell positioned at its first span; heap by (start, end, cell)
    heap = [(sub[i][0][0], sub[i][0][1], i) for i in range(n)]
    total_len = sum(sub[i][0][1] - sub[i][0][0] for i in range(n))
    # maxEndPositionCell: first cell (in clause order) achieving the max
    # end seen so far (adjustMax uses strict >)
    max_i = 0
    for i in range(1, n):
        if sub[i][0][1] > sub[max_i][idx[max_i]][1]:
            max_i = i
    heapq.heapify(heap)
    out: list[Span] = []

    def at_match() -> bool:
        min_start = heap[0][0]
        max_end = sub[max_i][idx[max_i]][1]
        return max_end - min_start - total_len <= slop

    def record() -> None:
        min_start = heap[0][0]
        mcell = sub[max_i][idx[max_i]]
        out.append((min_start, mcell[1], mcell[0] - min_start))

    def advance_min() -> bool:
        nonlocal total_len, max_i
        _, _, i = heapq.heappop(heap)
        idx[i] += 1
        if idx[i] == len(sub[i]):
            return False  # this cell exhausted -> doc done
        s, e, _ = sub[i][idx[i]]
        prev = sub[i][idx[i] - 1]
        total_len += (e - s) - (prev[1] - prev[0])
        if e > sub[max_i][idx[max_i]][1]:
            max_i = i
        heapq.heappush(heap, (s, e, i))
        return True

    # twoPhaseCurrentDocMatches: find the first match
    while not at_match():
        if not advance_min():
            return out
    record()
    # nextStartPosition loop: advance min, record on every match state
    while advance_min():
        if at_match():
            record()
    return out


def containing_spans(big: list[Span], little: list[Span]) -> list[Span]:
    """SpanContainingQuery: big spans enclosing a little span, by the
    reference's monotone two-pointer enumeration
    (SpanContainingQuery.java getSpans nextStartPosition: iterate big;
    advance little while little.start < big.start; emit the big span when
    big.end >= little.end).  Source spans (and widths) are the BIG side
    (ContainSpans.java:49-53 width() == sourceSpans.width())."""
    out: list[Span] = []
    li = 0
    for b in big:
        while little[li][0] < b[0]:
            li += 1
            if li == len(little):
                return out
        if b[1] >= little[li][1]:
            out.append(b)
    return out


def within_spans(big: list[Span], little: list[Span]) -> list[Span]:
    """SpanWithinQuery: little spans enclosed by a big span
    (SpanWithinQuery.java getSpans: iterate little; advance big while
    big.end < little.end; emit the little span when
    big.start <= little.start).  Source spans are the LITTLE side."""
    out: list[Span] = []
    bi = 0
    for l in little:
        while big[bi][1] < l[1]:
            bi += 1
            if bi == len(big):
                return out
        if big[bi][0] <= l[0]:
            out.append(l)
    return out


def position_range_spans(spans: list[Span], start: int, end: int
                         ) -> list[Span]:
    """SpanPositionRangeQuery acceptPosition
    (SpanPositionRangeQuery.java:30-37): accept spans with
    span.start >= start and span.end <= end; enumeration stops at the
    first span with span.start >= end (NO_MORE_IN_CURRENT_DOC)."""
    out: list[Span] = []
    for s in spans:
        if s[0] >= end:
            break
        if s[0] >= start and s[1] <= end:
            out.append(s)
    return out


# ------------------------------------------- composable clause evaluation

def doc_spans(clause, positions_of) -> list[Span] | None:
    """Spans of one span clause within ONE document (None = no match).
    positions_of(term) -> sorted position ndarray for the doc, or None.

    Clause grammar:
        ("sterm", term)
      | ("sor", [terms])                       # SpanOrQuery of terms
      | ("span_near", [clauses], slop, in_order)
      | ("span_first", clause, end_limit)     # SpanFirstQuery: end <= n
      | ("span_not", incl, excl[, pre, post]) # SpanNotQuery
      | ("span_containing", big, little)      # SpanContainingQuery
      | ("span_within", big, little)          # SpanWithinQuery
      | ("span_range", clause, start, end)    # SpanPositionRangeQuery
    """
    kind = clause[0]
    if kind == "sterm":
        p = positions_of(clause[1])
        return term_spans(p) if p is not None and p.size else None
    if kind == "sor":
        lists = []
        for t in clause[1]:
            p = positions_of(t)
            if p is not None and p.size:
                lists.append(term_spans(p))
        return or_spans(lists) if lists else None
    if kind == "span_near":
        subs = []
        for c in clause[1]:
            s = doc_spans(c, positions_of)
            if s is None:
                return None
            subs.append(s)
        m = (near_ordered if clause[3] else near_unordered)(subs, clause[2])
        return sorted(m) or None
    if kind == "span_first":
        s = doc_spans(clause[1], positions_of)
        if s is None:
            return None
        # SpanFirstQuery == SpanPositionRangeQuery(match, 0, n):
        # accept spans whose endPosition() <= n
        out = [x for x in s if x[1] <= clause[2]]
        return out or None
    if kind == "span_not":
        inc = doc_spans(clause[1], positions_of)
        if inc is None:
            return None
        exc = doc_spans(clause[2], positions_of) or []
        pre = clause[3] if len(clause) > 3 else 0
        post = clause[4] if len(clause) > 4 else 0
        # reject a candidate when an exclude span intersects the
        # [start - pre, end + post) window (SpanNotQuery.java:169-186)
        out = [
            c for c in inc
            if not any(e[1] > c[0] - pre and e[0] < c[1] + post for e in exc)
        ]
        return out or None
    if kind in ("span_containing", "span_within"):
        big = doc_spans(clause[1], positions_of)
        little = doc_spans(clause[2], positions_of)
        # ConjunctionSpans doc approximation: both sides must match
        if big is None or little is None:
            return None
        fn = containing_spans if kind == "span_containing" else within_spans
        return fn(big, little) or None
    if kind == "span_range":
        s = doc_spans(clause[1], positions_of)
        if s is None:
            return None
        return position_range_spans(s, clause[2], clause[3]) or None
    raise ValueError(f"not a span clause: {kind}")


def span_terms(clause, scoring: bool = False, top: bool = False) -> list[str]:
    """Terms of a span clause.  scoring=True gives the terms whose idfs
    weight the query (SpanWeight term map): a NESTED SpanNot contributes
    only its include terms (SpanNotWeight.extractTermContexts), but a
    TOP-LEVEL SpanNot weights include+exclude terms
    (SpanNotQuery.createWeight getTermContexts(include, exclude))."""
    kind = clause[0]
    if kind == "sterm":
        return [clause[1]]
    if kind == "sor":
        return list(clause[1])
    if kind == "span_near":
        return [t for c in clause[1] for t in span_terms(c, scoring)]
    if kind == "span_first":
        return span_terms(clause[1], scoring)
    if kind == "span_not":
        inc = span_terms(clause[1], scoring)
        if scoring and not top:
            return inc
        return inc + span_terms(clause[2], scoring)
    if kind in ("span_containing", "span_within"):
        # both sides weight the query: SpanContainingQuery.createWeight
        # passes getTermContexts(bigWeight, littleWeight)
        return span_terms(clause[1], scoring) + span_terms(clause[2], scoring)
    if kind == "span_range":
        return span_terms(clause[1], scoring)
    raise ValueError(kind)


def span_freq(spans_or_widths) -> np.float32:
    """SpanScorer freq: float32 accumulation of 1/(1+width) over the
    matches (accepts (start, end, width) triples or bare widths)."""
    freq = np.float32(0.0)
    for x in spans_or_widths:
        w = x[2] if isinstance(x, tuple) else x
        freq = np.float32(freq + np.float32(1.0) / np.float32(w + 1))
    return freq
