"""Daitch-Mokotoff Soundex (Daitch & Mokotoff 1985, the Avotaynu
standard coding chart; `Lucene.Net.Analysis.Phonetic/Language/
DaitchMokotoffSoundex.cs` + its dmrules.txt resource used as the
behavioral specification, validated against the reference's golden
vectors in tests).

D-M improves on Russell Soundex for Slavic/Yiddish surnames: 6-digit
codes, multi-character pattern rules with at-start / before-vowel /
default contexts, and BRANCHING — ambiguous sounds (c, ch, ck, rs, rz,
j, Polish nasals) emit every plausible code, so `GERSCHFELD` encodes to
four codes and matching happens on code-set intersection.
"""

from __future__ import annotations

_MAX_LENGTH = 6
_VOWELS = "aeiou"

# The published D-M coding chart: (pattern, at_start, before_vowel,
# default); "|" separates branching alternatives, "" = not coded.
_RULES_SRC: list[tuple[str, str, str, str]] = [
    # vowels
    ("a", "0", "", ""), ("e", "0", "", ""), ("i", "0", "", ""),
    ("o", "0", "", ""), ("u", "0", "", ""),
    # single consonants
    ("b", "7", "7", "7"), ("d", "3", "3", "3"), ("f", "7", "7", "7"),
    ("g", "5", "5", "5"), ("h", "5", "5", ""), ("k", "5", "5", "5"),
    ("l", "8", "8", "8"), ("m", "6", "6", "6"), ("n", "6", "6", "6"),
    ("p", "7", "7", "7"), ("q", "5", "5", "5"), ("r", "9", "9", "9"),
    ("s", "4", "4", "4"), ("t", "3", "3", "3"), ("v", "7", "7", "7"),
    ("w", "7", "7", "7"), ("x", "5", "54", "54"), ("y", "1", "", ""),
    ("z", "4", "4", "4"),
    # Romanian t-cedilla/t-comma; Polish nasal vowels
    ("ţ", "3|4", "3|4", "3|4"), ("ț", "3|4", "3|4", "3|4"),
    ("ę", "", "", "|6"), ("ą", "", "", "|6"),
    # multi-character sequences, longest first within their first char
    ("schtsch", "2", "4", "4"), ("schtsh", "2", "4", "4"),
    ("schtch", "2", "4", "4"), ("shtch", "2", "4", "4"),
    ("shtsh", "2", "4", "4"), ("stsch", "2", "4", "4"),
    ("ttsch", "4", "4", "4"), ("zhdzh", "2", "4", "4"),
    ("shch", "2", "4", "4"), ("scht", "2", "43", "43"),
    ("schd", "2", "43", "43"), ("stch", "2", "4", "4"),
    ("strz", "2", "4", "4"), ("strs", "2", "4", "4"),
    ("stsh", "2", "4", "4"), ("szcz", "2", "4", "4"),
    ("szcs", "2", "4", "4"), ("ttch", "4", "4", "4"),
    ("tsch", "4", "4", "4"), ("ttsz", "4", "4", "4"),
    ("zdzh", "2", "4", "4"), ("zsch", "4", "4", "4"),
    ("chs", "5", "54", "54"), ("csz", "4", "4", "4"),
    ("czs", "4", "4", "4"), ("drz", "4", "4", "4"),
    ("drs", "4", "4", "4"), ("dsh", "4", "4", "4"),
    ("dsz", "4", "4", "4"), ("dzh", "4", "4", "4"),
    ("dzs", "4", "4", "4"), ("sch", "4", "4", "4"),
    ("sht", "2", "43", "43"), ("szt", "2", "43", "43"),
    ("shd", "2", "43", "43"), ("szd", "2", "43", "43"),
    ("tch", "4", "4", "4"), ("trz", "4", "4", "4"),
    ("trs", "4", "4", "4"), ("tsh", "4", "4", "4"),
    ("tts", "4", "4", "4"), ("ttz", "4", "4", "4"),
    ("tzs", "4", "4", "4"), ("tsz", "4", "4", "4"),
    ("zdz", "2", "4", "4"), ("zhd", "2", "43", "43"),
    ("zsh", "4", "4", "4"),
    ("ai", "0", "1", ""), ("aj", "0", "1", ""), ("ay", "0", "1", ""),
    ("au", "0", "7", ""), ("cz", "4", "4", "4"), ("cs", "4", "4", "4"),
    ("ds", "4", "4", "4"), ("dz", "4", "4", "4"), ("dt", "3", "3", "3"),
    ("ei", "0", "1", ""), ("ej", "0", "1", ""), ("ey", "0", "1", ""),
    ("eu", "1", "1", ""), ("fb", "7", "7", "7"), ("ia", "1", "", ""),
    ("ie", "1", "", ""), ("io", "1", "", ""), ("iu", "1", "", ""),
    ("ks", "5", "54", "54"), ("kh", "5", "5", "5"),
    ("mn", "66", "66", "66"), ("nm", "66", "66", "66"),
    ("oi", "0", "1", ""), ("oj", "0", "1", ""), ("oy", "0", "1", ""),
    ("pf", "7", "7", "7"), ("ph", "7", "7", "7"), ("sh", "4", "4", "4"),
    ("sc", "2", "4", "4"), ("st", "2", "43", "43"),
    ("sd", "2", "43", "43"), ("sz", "4", "4", "4"), ("th", "3", "3", "3"),
    ("ts", "4", "4", "4"), ("tc", "4", "4", "4"), ("tz", "4", "4", "4"),
    ("ui", "0", "1", ""), ("uj", "0", "1", ""), ("uy", "0", "1", ""),
    ("ue", "0", "1", ""), ("zd", "2", "43", "43"), ("zh", "4", "4", "4"),
    ("zs", "4", "4", "4"),
    # branching rules
    ("c", "4|5", "4|5", "4|5"), ("ch", "4|5", "4|5", "4|5"),
    ("ck", "5|45", "5|45", "5|45"), ("rs", "4|94", "4|94", "4|94"),
    ("rz", "4|94", "4|94", "4|94"), ("j", "1|4", "|4", "|4"),
]

_FOLDINGS = {
    "ß": "s", "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a",
    "å": "a", "æ": "a", "ç": "c", "è": "e", "é": "e", "ê": "e",
    "ë": "e", "ì": "i", "í": "i", "î": "i", "ï": "i", "ð": "d",
    "ñ": "n", "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ø": "o", "ù": "u", "ú": "u", "û": "u", "ý": "y", "þ": "b",
    "ÿ": "y", "ć": "c", "ł": "l", "ś": "s", "ż": "z", "ź": "z",
}

# index rules by first char, longest pattern first (greedy match)
_RULES: dict[str, list[tuple[str, list[str], list[str], list[str]]]] = {}
for _p, _s, _v, _d in _RULES_SRC:
    _RULES.setdefault(_p[0], []).append(
        (_p, _s.split("|"), _v.split("|"), _d.split("|"))
    )
for _lst in _RULES.values():
    _lst.sort(key=lambda r: -len(r[0]))


class _Branch:
    __slots__ = ("code", "last")

    def __init__(self, code: str = "", last: str | None = None):
        self.code = code
        self.last = last

    def push(self, replacement: str, force: bool) -> None:
        if (
            self.last is None
            or not self.last.endswith(replacement)
            or force
        ) and len(self.code) < _MAX_LENGTH:
            self.code = (self.code + replacement)[:_MAX_LENGTH]
        self.last = replacement

    def finished(self) -> str:
        return self.code.ljust(_MAX_LENGTH, "0")


def dm_soundex_all(source: str, branching: bool = True) -> list[str]:
    """All D-M codes for ``source`` (branch order preserved, deduped,
    each zero-padded to 6); ``branching=False`` follows only the first
    alternative of every rule (the reference's Encode contract)."""
    cleaned = []
    for ch in source:
        if ch.isspace():
            continue
        ch = ch.lower()
        cleaned.append(_FOLDINGS.get(ch, ch))
    inp = "".join(cleaned)

    branches = [_Branch()]
    last_char = ""
    i = 0
    while i < len(inp):
        ch = inp[i]
        rules = _RULES.get(ch)
        if rules is None:
            i += 1
            continue
        for pattern, at_start, before_vowel, default in rules:
            if not inp.startswith(pattern, i):
                continue
            if last_char == "":
                replacements = at_start
            elif (
                i + len(pattern) < len(inp)
                and inp[i + len(pattern)] in _VOWELS
            ):
                replacements = before_vowel
            else:
                replacements = default
            force = (last_char == "m" and ch == "n") or (
                last_char == "n" and ch == "m"
            )
            if branching and len(replacements) > 1:
                nxt: list[_Branch] = []
                seen: set[str] = set()  # branch identity IS its code
                for b in branches:
                    for rep in replacements:
                        nb = _Branch(b.code, b.last)
                        nb.push(rep, force)
                        if nb.code not in seen:
                            seen.add(nb.code)
                            nxt.append(nb)
                branches = nxt
            else:
                for b in branches:
                    b.push(replacements[0], force)
            i += len(pattern)
            break
        else:
            i += 1
            continue
        last_char = ch
    out: list[str] = []
    for b in branches:
        code = b.finished()
        if code not in out:
            out.append(code)
    return out


def dm_soundex(source: str) -> str:
    """The non-branching D-M code (reference Encode contract)."""
    return dm_soundex_all(source, branching=False)[0]
