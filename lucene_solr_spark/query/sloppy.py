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
(advanceRpts, PhrasePositions.rptGroup bookkeeping) which is not
reimplemented; callers reject repeated-term sloppy phrases up front
(documented deviation — exact phrases with repeats still work).
"""

from __future__ import annotations

import heapq

import numpy as np


def sloppy_freq(adjusted: list[np.ndarray], offsets: list[int],
                slop: int) -> np.float32:
    """Sloppy phrase freq for ONE document.

    adjusted[i]: sorted offset-adjusted positions of clause i in the doc
    (raw position - clause offset, PhrasePositions.java:55-76);
    offsets[i]: the clause offset (pq tie-break key, PhraseQueue.java).
    Returns float32 freq (0.0 when no window fits the slop).
    """
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
