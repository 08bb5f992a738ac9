"""String distances for the spell-checker seam.

Faithful port of the reference JaroWinklerDistance
(src/Lucene.Net.Suggest/Spell/JaroWinklerDistance.cs): Jaro similarity
from the half-window match scan, Winkler prefix boost (scaling
min(0.1, 1/maxLen), prefix cap 4 via the common-prefix scan) applied only
above the 0.7 threshold. DirectSpellChecker accepts any IStringDistance;
spell_suggest(distance="jaro_winkler") ranks candidates by this score.
"""

from __future__ import annotations


def _matches(s1: str, s2: str) -> tuple[int, int, int, int]:
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    m = 0
    for i, c in enumerate(mn):
        for j in range(max(i - rng, 0), min(i + rng + 1, len(mx))):
            if not match_flags[j] and c == mx[j]:
                match_idx[i] = j
                match_flags[j] = True
                m += 1
                break
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[j] for j in range(len(mx)) if match_flags[j]]
    t = sum(1 for a, b in zip(ms1, ms2) if a != b)
    p = 0
    for a, b in zip(mn, mx):
        if a != b:
            break
        p += 1
    return m, t // 2, p, len(mx)


def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> float:
    """JaroWinklerDistance.GetDistance: 0 (unrelated) .. 1 (equal)."""
    m, t, p, l = _matches(s1, s2)
    if m == 0:
        return 0.0
    j = (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / l) * p * (1.0 - j)
