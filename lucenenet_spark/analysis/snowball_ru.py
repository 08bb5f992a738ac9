"""Russian Snowball language pack.

Reimplements the published Snowball Russian algorithm
(snowballstem.org/algorithms/russian/stemmer.html) that the reference's
machine-generated Tartarus class compiles from —
Lucene.Net.Analysis.Common/Analysis/Ru/RussianAnalyzer.cs
(StandardTokenizer -> LowerCase -> Stop -> SnowballFilter(Russian)).

All suffix matching happens inside RV (the region after the first
vowel): the whole backward pass runs under `setlimit tomark pV`, so a
candidate ending that starts before RV cannot match and a shorter
fitting candidate wins instead. Group-1 endings (perfective gerund,
participle, verb) additionally require the PRECEDING letter to be а or я
— that letter stays in the stem, and per Snowball among semantics a
failed precondition fails the whole among with no fallback to a shorter
suffix. ё is normalised to е on entry (the published algorithm assumes
this; newer Snowball revisions fold it in-line).

The stop set is the Snowball project Russian stop list.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer, _r_after

RUSSIAN_STOP_WORDS = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам ведь там потом себя ничего ей может они тут где есть надо ней для
мы тебя их чем была сам чтоб без будто чего раз тоже себе под будет ж
тогда кто этот того потому этого какой совсем ним здесь этом один почти
мой тем чтобы нее сейчас были куда зачем всех никогда можно при наконец
два об другой хоть после над больше тот через эти нас про всего них
какая много разве три эту моя впрочем хорошо свою этой перед иногда
лучше чуть том нельзя такой им более всегда конечно всю между
""".split())

_RU_VOWELS = frozenset("аеиоуыэюя")

# group-1 endings require the preceding letter to be а/я (kept in the
# stem); group-2 endings delete unconditionally. One among per family,
# matched longest-first.
_RU_GERUND_1 = ("в", "вши", "вшись")
_RU_GERUND_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")

_RU_ADJECTIVE = (
    "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их ых "
    "ую юю ая яя ою ею"
).split()

_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")

_RU_REFLEXIVE = ("ся", "сь")

_RU_VERB_1 = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно"
).split()
_RU_VERB_2 = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло ено "
    "ят ует уют ит ыт ены ить ыть ишь ую ю"
).split()

_RU_NOUN = (
    "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием ем "
    "ам ом о у ах иях ях ы ь ию ью ю ия ья я"
).split()

_RU_SUPERLATIVE = ("ейше", "ейш")
_RU_DERIVATIONAL = ("ость", "ост")


def _match_rv(w: str, rv: int, group1: tuple | list, group2: tuple | list = ()):
    """Longest candidate across both groups that fits inside RV; returns
    (suffix, needs_precondition) or None. Per among semantics the caller
    must treat a failed group-1 precondition as a full among failure."""
    best = None
    for s in group1:
        if w.endswith(s) and len(w) - len(s) >= rv:
            if best is None or len(s) > len(best[0]):
                best = (s, True)
    for s in group2:
        if w.endswith(s) and len(w) - len(s) >= rv:
            if best is None or len(s) > len(best[0]):
                best = (s, False)
    return best


def _strip_rv(w: str, rv: int, group1, group2=()):
    """Apply one among: remove the matched ending (group-1 endings keep
    their preceding а/я, which must itself lie inside RV). Returns the
    new word or None when the among failed."""
    m = _match_rv(w, rv, group1, group2)
    if m is None:
        return None
    s, pre = m
    if pre:
        i = len(w) - len(s) - 1
        if i < rv or i < 0 or w[i] not in ("а", "я"):
            return None  # precondition fails the WHOLE among
    return w[: len(w) - len(s)]


def russian_stem(word: str) -> str:
    w = word.lower().replace("ё", "е")
    n = len(w)
    rv = n
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r1 = _r_after(w, 0, _RU_VOWELS)
    r2 = _r_after(w, r1, _RU_VOWELS)

    # ---- step 1: perfective gerund, else (reflexive? then
    # adjectival | verb | noun, first that matches)
    out = _strip_rv(w, rv, _RU_GERUND_1, _RU_GERUND_2)
    if out is not None:
        w = out
    else:
        out = _strip_rv(w, rv, (), _RU_REFLEXIVE)
        if out is not None:
            w = out
        out = _strip_rv(w, rv, (), _RU_ADJECTIVE)
        if out is not None:
            w = out
            out = _strip_rv(w, rv, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
            if out is not None:
                w = out
        else:
            out = _strip_rv(w, rv, _RU_VERB_1, _RU_VERB_2)
            if out is not None:
                w = out
            else:
                out = _strip_rv(w, rv, (), _RU_NOUN)
                if out is not None:
                    w = out

    # ---- step 2: trailing и (in RV)
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational ость/ост, the match confined to R2
    for s in _RU_DERIVATIONAL:
        if w.endswith(s) and len(w) - len(s) >= r2:
            w = w[: len(w) - len(s)]
            break

    # ---- step 4 (tidy up, in RV): undouble нн; or superlative then
    # undouble нн; or drop trailing ь. Both н of the pair must lie in RV
    # (the among matches one н, the routine consumes the second).
    if w.endswith("нн") and len(w) - 2 >= rv:
        w = w[:-1]
    else:
        m = _match_rv(w, rv, (), _RU_SUPERLATIVE)
        if m is not None:
            w = w[: len(w) - len(m[0])]
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


class RussianAnalyzer(_SnowballAnalyzer):
    """Analysis/Ru/RussianAnalyzer.cs analogue (Snowball stop set + stem)."""

    _stem = staticmethod(russian_stem)

    def __init__(self, stopwords=RUSSIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
