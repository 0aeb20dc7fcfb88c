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

Span = tuple[int, int]  # (start, end); term spans have end = start + 1


def term_spans(positions: np.ndarray) -> list[Span]:
    return [(int(p), int(p) + 1) for p in positions]


def or_spans(span_lists: list[list[Span]]) -> list[Span]:
    """SpanOrQuery: merged sub-span lists in (start, end) order."""
    out: list[Span] = []
    for sl in span_lists:
        out.extend(sl)
    out.sort()
    return out


def near_ordered_widths(sub: list[list[Span]], slop: int) -> list[int]:
    """Widths of every NearSpansOrdered match in one doc (each sub list
    sorted by (start, end), all non-empty)."""
    n = len(sub)
    idx = [0] * n
    widths: list[int] = []
    L0 = sub[0]
    while idx[0] < len(L0):
        # stretchToOrder (NearSpansOrdered.java:100-121)
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
            widths.append(width)
        idx[0] += 1
    return widths


def near_unordered_widths(sub: list[list[Span]], slop: int) -> list[int]:
    """Scoring widths (maxEndCell.start - minCell.start) of every
    NearSpansUnordered match in one doc."""
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
    widths: list[int] = []

    def at_match() -> bool:
        min_start = heap[0][0]
        max_end = sub[max_i][idx[max_i]][1]
        return max_end - min_start - total_len <= slop

    def record() -> None:
        min_start = heap[0][0]
        max_cell_start = sub[max_i][idx[max_i]][0]
        widths.append(max_cell_start - min_start)

    def advance_min() -> bool:
        nonlocal total_len, max_i
        _, _, i = heapq.heappop(heap)
        idx[i] += 1
        if idx[i] == len(sub[i]):
            return False  # this cell exhausted -> doc done
        s, e = sub[i][idx[i]]
        total_len += (e - s) - (sub[i][idx[i] - 1][1] - sub[i][idx[i] - 1][0])
        if e > sub[max_i][idx[max_i]][1]:
            max_i = i
        heapq.heappush(heap, (s, e, i))
        return True

    # twoPhaseCurrentDocMatches: find the first match
    while not at_match():
        if not advance_min():
            return widths
    record()
    # nextStartPosition loop: advance min, record on every match state
    while advance_min():
        if at_match():
            record()
    return widths


def span_freq(widths: list[int]) -> np.float32:
    """SpanScorer freq: float32 accumulation of 1/(1+width)."""
    freq = np.float32(0.0)
    for w in widths:
        freq = np.float32(freq + np.float32(1.0) / np.float32(w + 1))
    return freq
