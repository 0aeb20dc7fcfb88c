"""Sloppy-phrase match counting — the SloppyPhraseScorer executable spec.

Exact restatement of the reference's greedy match enumeration for
repeat-free phrases (search/SloppyPhraseScorer.java:90-131 phraseFreq):
all phrase positions start at their first (offset-adjusted) position;
the minimum position advances repeatedly, shrinking the current match
window; each time the advancing position overtakes the next-smallest
one, the best window seen is scored with slopFactor = 1/(1+matchLength)
(BM25Similarity.java SimScorer.computeSlopFactor) if it fits the slop.
freq accumulates in float32 exactly like the Java `float freq`.

Like `multiterm`'s expansion helpers, this single function is the shared
matching semantics used by the serving engine, the distributed executor
and the numpy oracle, so all three score sloppy phrases identically.

Phrases with REPEATED terms take the reference's `hasRpts` path
(SloppyPhraseScorer.java:147-256): at init each repeat group (the
PhrasePositions of one repeated term, sorted by query offset) is
staggered so member j starts at the term's (j+1)-th occurrence
(advanceRepeatGroups, the non-multi-term branch); during enumeration
every advance resolves collisions by repeatedly advancing the lesser of
any two group members sitting on the same document position
(advanceRpts/collide/lesser), re-queuing moved members.  With
single-term clauses (no MultiPhraseQuery) repeat groups are exactly the
same-term clause sets, so grouping is doc-independent — the reference
computes the same groups from the first candidate doc's tpPos values.
"""

from __future__ import annotations

import heapq

import numpy as np


def repeat_groups(terms: list[str]) -> list[list[int]]:
    """Clause-index groups of repeated terms (repeatingTerms /
    gatherRptGroups for single-term clauses): for each term appearing in
    >= 2 clauses, its clause indices in offset order.  Empty when the
    phrase is repeat-free (the hasRpts flag)."""
    by_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    return [g for g in by_term.values() if len(g) >= 2]


class _PP:
    """PhrasePositions.java: one clause's offset-adjusted position
    stream with repeat-group bookkeeping."""

    __slots__ = ("arr", "offset", "ord", "idx", "position", "rpt_group")

    def __init__(self, arr: np.ndarray, offset: int, ord_: int):
        self.arr = arr
        self.offset = offset
        self.ord = ord_
        self.idx = 0
        self.position = int(arr[0])
        self.rpt_group = -1

    def advance(self) -> bool:
        self.idx += 1
        if self.idx >= len(self.arr):
            return False
        self.position = int(self.arr[self.idx])
        return True


def _sloppy_freq_rpts(adjusted: list[np.ndarray], offsets: list[int],
                      slop: int, groups: list[list[int]]) -> np.float32:
    """The hasRpts enumeration (SloppyPhraseScorer.java phraseFreq with
    advanceRpts), single-term clauses.  The priority queue is modeled
    with a lazy-deletion heap: PhraseQueue's comparator
    (position, offset, ord) is a total order, so any correct priority
    queue pops the same sequence; entries whose position no longer
    matches their PP are skipped."""
    pps = [_PP(adjusted[i], offsets[i], i) for i in range(len(adjusted))]
    group_pps: list[list[_PP]] = []
    for gi, g in enumerate(groups):
        rg = [pps[i] for i in g]
        for pp in rg:
            pp.rpt_group = gi
        group_pps.append(rg)
        # advanceRepeatGroups, non-multi-term branch: member j starts at
        # the (j+1)-th occurrence
        for j in range(1, len(rg)):
            for _ in range(j):
                if not rg[j].advance():
                    return np.float32(0.0)

    def tp_pos(pp: _PP) -> int:
        return pp.position + pp.offset

    def collide(pp: _PP) -> _PP | None:
        for pp2 in group_pps[pp.rpt_group]:
            if pp2 is not pp and tp_pos(pp2) == tp_pos(pp):
                return pp2
        return None

    def advance_rpts(pp0: _PP) -> bool:
        """advanceRpts: resolve collisions by advancing the lesser of
        the colliding pair (advancePP inside, so `end` tracks); members
        moved while queued get a refreshed heap entry (the bits/rptStack
        re-queue in lazy-deletion form)."""
        nonlocal end
        pp = pp0
        if pp.rpt_group < 0:
            return True
        while (other := collide(pp)) is not None:
            lesser = (
                pp
                if (pp.position, pp.offset) < (other.position, other.offset)
                else other
            )
            if not lesser.advance():
                return False
            if lesser.position > end:
                end = lesser.position
            if lesser is not pp0:
                heapq.heappush(
                    heap, (lesser.position, lesser.offset, lesser.ord)
                )
            pp = lesser
        return True

    # fillQueue
    end = max(pp.position for pp in pps)
    heap = [(pp.position, pp.offset, pp.ord) for pp in pps]
    heapq.heapify(heap)

    def pop() -> _PP:
        while True:
            pos, off, o = heapq.heappop(heap)
            if pps[o].position == pos:
                return pps[o]

    def top_position() -> int:
        while True:
            pos, off, o = heap[0]
            if pps[o].position == pos:
                return pos
            heapq.heappop(heap)

    freq = np.float32(0.0)
    pp = pop()
    match_len = end - pp.position
    next_pos = top_position()
    while True:
        if not pp.advance():
            break
        if pp.position > end:
            end = pp.position
        if groups and not advance_rpts(pp):
            break
        if pp.position > next_pos:
            if match_len <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_len + 1)
                )
            heapq.heappush(heap, (pp.position, pp.offset, pp.ord))
            pp = pop()
            next_pos = top_position()
            match_len = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_len + 1))
    return freq


def sloppy_freq(adjusted: list[np.ndarray], offsets: list[int],
                slop: int, groups: list[list[int]] | None = None
                ) -> np.float32:
    """Sloppy phrase freq for ONE document.

    adjusted[i]: sorted offset-adjusted positions of clause i in the doc
    (raw position - clause offset, PhrasePositions.java:55-76);
    offsets[i]: the clause offset (pq tie-break key, PhraseQueue.java);
    groups: repeat_groups(terms) when the phrase repeats terms (the
    hasRpts path) — empty/None takes the simple path.
    Returns float32 freq (0.0 when no window fits the slop).
    """
    if groups:
        return _sloppy_freq_rpts(adjusted, offsets, slop, groups)
    n = len(adjusted)
    idx = [0] * n
    # PhraseQueue order: (position, offset, ord)  (PhraseQueue.java:24-40)
    heap = [(int(adjusted[i][0]), offsets[i], i) for i in range(n)]
    end = max(h[0] for h in heap)
    heapq.heapify(heap)
    freq = np.float32(0.0)
    pos, off, ordi = heapq.heappop(heap)
    match_len = end - pos
    next_pos = heap[0][0]
    while True:
        # advancePP (SloppyPhraseScorer.java:135-143)
        idx[ordi] += 1
        if idx[ordi] >= len(adjusted[ordi]):
            break  # this pp exhausted -> score the final window below
        pos = int(adjusted[ordi][idx[ordi]])
        if pos > end:
            end = pos
        if pos > next_pos:  # done minimizing the current match window
            if match_len <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(match_len + 1)
                )
            heapq.heappush(heap, (pos, off, ordi))
            pos, off, ordi = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_len = end - pos
        else:
            ml2 = end - pos
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq = np.float32(freq + np.float32(1.0) / np.float32(match_len + 1))
    return freq
