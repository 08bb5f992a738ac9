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


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """N-gram similarity (Kondrak 2005, "N-gram similarity and distance",
    SPIRE/LNCS 3772) as the reference's NGramDistance
    (Suggest/Spell/NGramDistance.cs) computes it: an edit-distance DP
    over n-gram windows with a null-character prefix of size n-1 so edge
    characters participate in n windows, prefix-null matches discounted.
    Returns 1 (identical) .. 0 (nothing in common). Strings shorter than
    n fall back to positional character overlap."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for a, b in zip(source, target) if a == b)
        return cost / max(sl, tl)
    sa = "\0" * (n - 1) + source
    prev = [float(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        t_j = ("\0" * (n - j) + target[:j]) if j < n else target[j - n : j]
        cur = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for k in range(n):
                if sa[i - 1 + k] != t_j[k]:
                    cost += 1
                elif sa[i - 1 + k] == "\0":
                    tn -= 1  # discount prefix-null matches
            cur[i] = min(cur[i - 1] + 1.0, prev[i] + 1.0, prev[i - 1] + cost / tn)
        prev = cur
    return 1.0 - prev[sl] / max(sl, tl)
