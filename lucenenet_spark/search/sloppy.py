"""Faithful SloppyPhraseScorer.PhraseFreq port (per-candidate-doc scalar;
runs inside the searcher's mapInPandas batch).

Reference: src/Lucene.Net/Search/SloppyPhraseScorer.cs —
- PhraseFreq (:103-146): pop the min PhrasePosition, keep advancing THAT
  pp while it stays <= the queue head, MINIMIZING matchLength = end - pos;
  score 1/(1+matchLength) only when the pp overtakes the head (or on
  exhaustion). NOT one score per heap step — consecutive advances of the
  same pp merge into one match.
- Repeats (same term at several phrase slots): repetition groups sorted by
  query offset; AdvanceRepeatGroups (:339-376) staggers initial positions
  (j-th member advanced j times), Collide/AdvanceRpts (:168-243) keep
  members of a group on distinct actual token positions (tpPos = phrase
  position + offset), always advancing the lesser of a colliding pair.
- Queue order: (position, offset) per PhraseQueue.

The queue is a small list re-scanned per operation (2-8 slots) — exact
re-queue semantics of AdvanceRpts without heap bookkeeping.
"""

from __future__ import annotations


def sloppy_phrase_freq(
    pos_lists: list[list[int]],
    offsets: list[int],
    slop: int,
    terms: list[str] | None = None,
    use_f32: bool = False,
) -> float:
    """Sloppy frequency of one candidate doc.

    pos_lists[i]: ascending PHRASE positions of slot i (token pos - offset);
    offsets[i]: the slot's query offset (resolved_positions);
    terms[i]: the slot's term (repetition grouping key) — slots sharing a
    term form a repetition group. Returns sum of 1/(1+matchLength) over
    matches with matchLength <= slop.
    """
    n = len(pos_lists)
    its = [list(p) for p in pos_lists]
    idx = [0] * n
    pos = [its[i][0] for i in range(n)]

    def advance(i: int) -> bool:
        idx[i] += 1
        if idx[i] >= len(its[i]):
            return False
        pos[i] = its[i][idx[i]]
        return True

    # ---- repetition groups: slots sharing a term, sorted by query offset
    keys = terms if terms is not None else list(range(n))
    by_key: dict[object, list[int]] = {}
    for i in range(n):
        by_key.setdefault(keys[i], []).append(i)
    groups = [sorted(g, key=lambda i: offsets[i]) for g in by_key.values() if len(g) > 1]
    grp_of = [-1] * n
    for gi, g in enumerate(groups):
        for i in g:
            grp_of[i] = gi
    has_rpts = bool(groups)

    def tp(i: int) -> int:
        return pos[i] + offsets[i]

    def lesser(i: int, j: int) -> int:
        if pos[i] < pos[j] or (pos[i] == pos[j] and offsets[i] < offsets[j]):
            return i
        return j

    def collide(i: int) -> int:
        g = groups[grp_of[i]]
        for j in g:
            if j != i and tp(j) == tp(i):
                return j
        return -1

    # ---- init: stagger repeat groups (AdvanceRepeatGroups, simple case)
    if has_rpts:
        for g in groups:
            for j in range(1, len(g)):
                for _ in range(j):
                    if not advance(g[j]):
                        return 0.0

    def advance_rpts(i: int) -> bool:
        """Collision resolution after advancing slot i (AdvanceRpts)."""
        if grp_of[i] < 0:
            return True
        cur = i
        while True:
            k = collide(cur)
            if k < 0:
                return True
            cur = lesser(cur, k)
            if not advance(cur):
                return False
            if pos[cur] > end[0]:
                end[0] = pos[cur]

    # ---- the walk (PhraseFreq)
    end = [max(pos)]
    in_queue = list(range(n))

    def pop_min() -> int:
        m = min(in_queue, key=lambda i: (pos[i], offsets[i]))
        in_queue.remove(m)
        return m

    def top_pos() -> int:
        return min((pos[i], offsets[i]) for i in in_queue)[0]

    if use_f32:
        import numpy as np
    freq = 0.0
    pp = pop_min()
    match_length = end[0] - pos[pp]
    next_ = top_pos()
    while True:
        if not advance(pp):
            break
        if pos[pp] > end[0]:
            end[0] = pos[pp]
        if has_rpts and not advance_rpts(pp):
            break
        if pos[pp] > next_:
            if match_length <= slop:
                # reference accumulates freq in float32 (float freq +=
                # ComputeSlopFactor); double mode keeps float64
                if use_f32:
                    freq = float(np.float32(freq) + np.float32(1.0 / (1.0 + match_length)))
                else:
                    freq += 1.0 / (1.0 + match_length)
            in_queue.append(pp)
            pp = pop_min()
            next_ = top_pos()
            match_length = end[0] - pos[pp]
        else:
            ml2 = end[0] - pos[pp]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        if use_f32:
            freq = float(np.float32(freq) + np.float32(1.0 / (1.0 + match_length)))
        else:
            freq += 1.0 / (1.0 + match_length)
    return freq
