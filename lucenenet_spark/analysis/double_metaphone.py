"""Double Metaphone (Lawrence Philips, C/C++ Users Journal, June 2000)
— the commons-codec edition the reference wraps
(`Lucene.Net.Analysis.Phonetic/Language/DoubleMetaphone.cs`, used as the
behavioral specification; validated against the reference's own golden
vectors in tests/test_phonetic.py).

Returns BOTH encodings: the primary code and the alternate that captures
a second plausible pronunciation (Slavo-Germanic, Spanish, French,
Italian branches) — `Smith` -> (SM0, XMT), `schneider` -> (XNTR, SNTR).
"""

from __future__ import annotations

_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER",
)
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    __slots__ = ("p", "a", "maxlen")

    def __init__(self, maxlen: int):
        self.p: list[str] = []
        self.a: list[str] = []
        self.maxlen = maxlen

    def add(self, primary: str, alternate: str | None = None) -> None:
        if alternate is None:
            alternate = primary
        room = self.maxlen - len(self.p)
        if room > 0:
            self.p.extend(primary[:room])
        room = self.maxlen - len(self.a)
        if room > 0:
            self.a.extend(alternate[:room])

    def add_primary(self, s: str) -> None:
        room = self.maxlen - len(self.p)
        if room > 0:
            self.p.extend(s[:room])

    def add_alternate(self, s: str) -> None:
        room = self.maxlen - len(self.a)
        if room > 0:
            self.a.extend(s[:room])

    @property
    def complete(self) -> bool:
        return len(self.p) >= self.maxlen and len(self.a) >= self.maxlen


def _ch(v: str, i: int) -> str:
    return v[i] if 0 <= i < len(v) else "\0"


def _has(v: str, start: int, length: int, *crit: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    return v[start : start + length] in crit


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _slavo_germanic(v: str) -> bool:
    return "W" in v or "K" in v or "CZ" in v or "WITZ" in v


def double_metaphone(value: str, max_code_len: int = 4) -> tuple[str, str]:
    """(primary, alternate) Double Metaphone codes, default cap 4."""
    value = value.strip().upper() if value else ""
    if not value:
        return "", ""
    sg = _slavo_germanic(value)
    i = 1 if value.startswith(_SILENT_START) else 0
    r = _Result(max_code_len)
    n = len(value)
    while not r.complete and i <= n - 1:
        c = value[i]
        if c in "AEIOUY":
            if i == 0:
                r.add("A")
            i += 1
        elif c == "B":
            r.add("P")
            i += 2 if _ch(value, i + 1) == "B" else 1
        elif c == "Ç":  # C-cedilla
            r.add("S")
            i += 1
        elif c == "C":
            i = _handle_c(value, r, i)
        elif c == "D":
            i = _handle_d(value, r, i)
        elif c == "F":
            r.add("F")
            i += 2 if _ch(value, i + 1) == "F" else 1
        elif c == "G":
            i = _handle_g(value, r, i, sg)
        elif c == "H":
            i = _handle_h(value, r, i)
        elif c == "J":
            i = _handle_j(value, r, i, sg)
        elif c == "K":
            r.add("K")
            i += 2 if _ch(value, i + 1) == "K" else 1
        elif c == "L":
            i = _handle_l(value, r, i)
        elif c == "M":
            r.add("M")
            i += 2 if _condition_m0(value, i) else 1
        elif c == "N":
            r.add("N")
            i += 2 if _ch(value, i + 1) == "N" else 1
        elif c == "Ñ":  # N-tilde
            r.add("N")
            i += 1
        elif c == "P":
            i = _handle_p(value, r, i)
        elif c == "Q":
            r.add("K")
            i += 2 if _ch(value, i + 1) == "Q" else 1
        elif c == "R":
            i = _handle_r(value, r, i, sg)
        elif c == "S":
            i = _handle_s(value, r, i, sg)
        elif c == "T":
            i = _handle_t(value, r, i)
        elif c == "V":
            r.add("F")
            i += 2 if _ch(value, i + 1) == "V" else 1
        elif c == "W":
            i = _handle_w(value, r, i)
        elif c == "X":
            i = _handle_x(value, r, i)
        elif c == "Z":
            i = _handle_z(value, r, i, sg)
        else:
            i += 1
    return "".join(r.p), "".join(r.a)


def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):
        r.add("K")
        return i + 2
    if i == 0 and _has(v, i, 6, "CAESAR"):
        r.add("S")
        return i + 2
    if _has(v, i, 2, "CH"):
        return _handle_ch(v, r, i)
    if _has(v, i, 2, "CZ") and not _has(v, i - 2, 4, "WICZ"):
        r.add("S", "X")  # Czerny
        return i + 2
    if _has(v, i + 1, 3, "CIA"):
        r.add("X")  # focaccia
        return i + 3
    if _has(v, i, 2, "CC") and not (i == 1 and _ch(v, 0) == "M"):
        return _handle_cc(v, r, i)  # double cc, but not McClelland
    if _has(v, i, 2, "CK", "CG", "CQ"):
        r.add("K")
        return i + 2
    if _has(v, i, 2, "CI", "CE", "CY"):
        if _has(v, i, 3, "CIO", "CIE", "CIA"):
            r.add("S", "X")  # Italian vs English
        else:
            r.add("S")
        return i + 2
    r.add("K")
    if _has(v, i + 1, 2, " C", " Q", " G"):
        return i + 3  # Mac Caffrey, Mac Gregor
    if _has(v, i + 1, 1, "C", "K", "Q") and not _has(v, i + 1, 2, "CE", "CI"):
        return i + 2
    return i + 1


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if _has(v, i + 2, 1, "I", "E", "H") and not _has(v, i + 2, 2, "HU"):
        # bellocchio but not bacchus
        if (i == 1 and _ch(v, i - 1) == "A") or _has(v, i - 1, 5, "UCCEE", "UCCES"):
            r.add("KS")  # accident, accede, succeed
        else:
            r.add("X")  # bacci, bertucci
        return i + 3
    r.add("K")  # Pierce's rule
    return i + 2


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _has(v, i, 4, "CHAE"):
        r.add("K", "X")  # Michael
        return i + 2
    if _condition_ch0(v, i) or _condition_ch1(v, i):
        r.add("K")  # Greek/Germanic kh sound
        return i + 2
    if i > 0:
        if _has(v, 0, 2, "MC"):
            r.add("K")
        else:
            r.add("X", "K")
    else:
        r.add("X")
    return i + 2


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _has(v, i, 2, "DG"):
        if _has(v, i + 2, 1, "I", "E", "Y"):
            r.add("J")  # edge
            return i + 3
        r.add("TK")  # Edgar
        return i + 2
    if _has(v, i, 2, "DT", "DD"):
        r.add("T")
        return i + 2
    r.add("T")
    return i + 1


def _handle_g(v: str, r: _Result, i: int, sg: bool) -> int:
    if _ch(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _ch(v, i + 1) == "N":
        if i == 1 and _is_vowel(_ch(v, 0)) and not sg:
            r.add("KN", "N")
        elif not _has(v, i + 2, 2, "EY") and _ch(v, i + 1) != "Y" and not sg:
            r.add("N", "KN")
        else:
            r.add("KN")
        return i + 2
    if _has(v, i + 1, 2, "LI") and not sg:
        r.add("KL", "L")
        return i + 2
    if i == 0 and (
        _ch(v, i + 1) == "Y" or _has(v, i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)
    ):
        r.add("K", "J")  # ges-, gep-, gie- at start
        return i + 2
    if (
        (_has(v, i + 1, 2, "ER") or _ch(v, i + 1) == "Y")
        and not _has(v, 0, 6, "DANGER", "RANGER", "MANGER")
        and not _has(v, i - 1, 1, "E", "I")
        and not _has(v, i - 1, 3, "RGY", "OGY")
    ):
        r.add("K", "J")  # -ger-, -gy-
        return i + 2
    if _has(v, i + 1, 1, "E", "I", "Y") or _has(v, i - 1, 4, "AGGI", "OGGI"):
        if _has(v, 0, 4, "VAN ", "VON ") or _has(v, 0, 3, "SCH") or _has(
            v, i + 1, 2, "ET"
        ):
            r.add("K")  # obvious germanic
        elif _has(v, i + 1, 3, "IER"):
            r.add("J")
        else:
            r.add("J", "K")  # Italian biaggi
        return i + 2
    if _ch(v, i + 1) == "G":
        r.add("K")
        return i + 2
    r.add("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_ch(v, i - 1)):
        r.add("K")
        return i + 2
    if i == 0:
        r.add("J" if _ch(v, i + 2) == "I" else "K")
        return i + 2
    if (
        (i > 1 and _has(v, i - 2, 1, "B", "H", "D"))
        or (i > 2 and _has(v, i - 3, 1, "B", "H", "D"))
        or (i > 3 and _has(v, i - 4, 1, "B", "H"))
    ):
        return i + 2  # Parker's rule: hugh
    if i > 2 and _ch(v, i - 1) == "U" and _has(v, i - 3, 1, "C", "G", "L", "R", "T"):
        r.add("F")  # laugh, cough, rough, tough
    elif i > 0 and _ch(v, i - 1) != "I":
        r.add("K")
    return i + 2


def _handle_h(v: str, r: _Result, i: int) -> int:
    # keep only if first & before vowel, or between two vowels (eats HH)
    if (i == 0 or _is_vowel(_ch(v, i - 1))) and _is_vowel(_ch(v, i + 1)):
        r.add("H")
        return i + 2
    return i + 1


def _handle_j(v: str, r: _Result, i: int, sg: bool) -> int:
    if _has(v, i, 4, "JOSE") or _has(v, 0, 4, "SAN "):
        # obvious Spanish: Jose, San Jacinto (precedence as in the spec:
        # (i==0 and v[i+4]==' ') or len==4 or startswith 'SAN ')
        if (
            (i == 0 and _ch(v, i + 4) == " ")
            or len(v) == 4
            or _has(v, 0, 4, "SAN ")
        ):
            r.add("H")
        else:
            r.add("J", "H")
        return i + 1
    if i == 0 and not _has(v, i, 4, "JOSE"):
        r.add("J", "A")
    elif (
        _is_vowel(_ch(v, i - 1))
        and not sg
        and (_ch(v, i + 1) == "A" or _ch(v, i + 1) == "O")
    ):
        r.add("J", "H")
    elif i == len(v) - 1:
        r.add("J", " ")
    elif not _has(v, i + 1, 1, *_L_T_K_S_N_M_B_Z) and not _has(
        v, i - 1, 1, "S", "K", "L"
    ):
        r.add("J")
    return i + 2 if _ch(v, i + 1) == "J" else i + 1


def _handle_l(v: str, r: _Result, i: int) -> int:
    if _ch(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.add_primary("L")  # cabrillo, gallegos: alternate drops L
        else:
            r.add("L")
        return i + 2
    r.add("L")
    return i + 1


def _handle_p(v: str, r: _Result, i: int) -> int:
    if _ch(v, i + 1) == "H":
        r.add("F")
        return i + 2
    r.add("P")
    return i + 2 if _has(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v: str, r: _Result, i: int, sg: bool) -> int:
    if (
        i == len(v) - 1
        and not sg
        and _has(v, i - 2, 2, "IE")
        and not _has(v, i - 4, 2, "ME", "MA")
    ):
        r.add_alternate("R")  # French: rogier
    else:
        r.add("R")
    return i + 2 if _ch(v, i + 1) == "R" else i + 1


def _handle_s(v: str, r: _Result, i: int, sg: bool) -> int:
    if _has(v, i - 1, 3, "ISL", "YSL"):
        return i + 1  # island, isle, carlisle
    if i == 0 and _has(v, i, 5, "SUGAR"):
        r.add("X", "S")
        return i + 1
    if _has(v, i, 2, "SH"):
        if _has(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.add("S")  # germanic
        else:
            r.add("X")
        return i + 2
    if _has(v, i, 3, "SIO", "SIA") or _has(v, i, 4, "SIAN"):
        r.add("S") if sg else r.add("S", "X")  # Italian/Armenian
        return i + 3
    if (i == 0 and _has(v, i + 1, 1, "M", "N", "L", "W")) or _has(v, i + 1, 1, "Z"):
        r.add("S", "X")  # smith ~ schmidt, -sz-
        return i + 2 if _has(v, i + 1, 1, "Z") else i + 1
    if _has(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if i == len(v) - 1 and _has(v, i - 2, 2, "AI", "OI"):
        r.add_alternate("S")  # French: resnais, artois
    else:
        r.add("S")
    return i + 2 if _has(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _ch(v, i + 2) == "H":
        # Schlesinger's rule
        if _has(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _has(v, i + 3, 2, "ER", "EN"):
                r.add("X", "SK")  # schermerhorn, schenker
            else:
                r.add("SK")  # Dutch: school, schooner
        elif i == 0 and not _is_vowel(_ch(v, 3)) and _ch(v, 3) != "W":
            r.add("X", "S")
        else:
            r.add("X")
    elif _has(v, i + 2, 1, "I", "E", "Y"):
        r.add("S")
    else:
        r.add("SK")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _has(v, i, 4, "TION"):
        r.add("X")
        return i + 3
    if _has(v, i, 3, "TIA", "TCH"):
        r.add("X")
        return i + 3
    if _has(v, i, 2, "TH") or _has(v, i, 3, "TTH"):
        if (
            _has(v, i + 2, 2, "OM", "AM")
            or _has(v, 0, 4, "VAN ", "VON ")
            or _has(v, 0, 3, "SCH")
        ):
            r.add("T")  # thomas, thames, germanic
        else:
            r.add("0", "T")
        return i + 2
    r.add("T")
    return i + 2 if _has(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _has(v, i, 2, "WR"):
        r.add("R")  # also mid-word
        return i + 2
    if i == 0 and (_is_vowel(_ch(v, i + 1)) or _has(v, i, 2, "WH")):
        if _is_vowel(_ch(v, i + 1)):
            r.add("A", "F")  # Wasserman ~ Vasserman
        else:
            r.add("A")  # Uomo ~ Womo
        return i + 1
    if (
        (i == len(v) - 1 and _is_vowel(_ch(v, i - 1)))
        or _has(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
        or _has(v, 0, 3, "SCH")
    ):
        r.add_alternate("F")  # Arnow ~ Arnoff
        return i + 1
    if _has(v, i, 4, "WICZ", "WITZ"):
        r.add("TS", "FX")  # Polish: filipowicz
        return i + 4
    return i + 1


def _handle_x(v: str, r: _Result, i: int) -> int:
    if i == 0:
        r.add("S")
        return i + 1
    if not (
        i == len(v) - 1
        and (_has(v, i - 3, 3, "IAU", "EAU") or _has(v, i - 2, 2, "AU", "OU"))
    ):
        r.add("KS")  # not French breaux
    return i + 2 if _has(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v: str, r: _Result, i: int, sg: bool) -> int:
    if _ch(v, i + 1) == "H":
        r.add("J")  # pinyin: zhao
        return i + 2
    if _has(v, i + 1, 2, "ZO", "ZI", "ZA") or (sg and i > 0 and _ch(v, i - 1) != "T"):
        r.add("S", "TS")
    else:
        r.add("S")
    return i + 2 if _ch(v, i + 1) == "Z" else i + 1


def _condition_c0(v: str, i: int) -> bool:
    if _has(v, i, 4, "CHIA"):
        return True
    if i <= 1 or _is_vowel(_ch(v, i - 2)) or not _has(v, i - 1, 3, "ACH"):
        return False
    c = _ch(v, i + 2)
    return (c != "I" and c != "E") or _has(v, i - 2, 6, "BACHER", "MACHER")


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if not _has(v, i + 1, 5, "HARAC", "HARIS") and not _has(
        v, i + 1, 3, "HOR", "HYM", "HIA", "HEM"
    ):
        return False
    return not _has(v, 0, 5, "CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return (
        _has(v, 0, 4, "VAN ", "VON ")
        or _has(v, 0, 3, "SCH")
        or _has(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
        or _has(v, i + 2, 1, "T", "S")
        or (
            (_has(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
            and (
                _has(v, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                or i + 1 == len(v) - 1
            )
        )
    )


def _condition_l0(v: str, i: int) -> bool:
    if i == len(v) - 3 and _has(v, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (
        _has(v, len(v) - 2, 2, "AS", "OS") or _has(v, len(v) - 1, 1, "A", "O")
    ) and _has(v, i - 1, 4, "ALLE")


def _condition_m0(v: str, i: int) -> bool:
    if _ch(v, i + 1) == "M":
        return True
    return _has(v, i - 1, 3, "UMB") and (
        i + 1 == len(v) - 1 or _has(v, i + 2, 2, "ER")
    )
