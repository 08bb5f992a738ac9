"""Hunspell affix engine: .aff/.dic parsing + affix stemming.

Reimplements the core of Analysis/Hunspell/{Dictionary,Stemmer}.cs —
the engine is fully functional; users supply their own .aff/.dic pair
(the reference ships none either; its tests use tiny inline
dictionaries, mirrored in tests/test_hunspell.py).

Supported (semantics traced from the reference):
- PFX/SFX rules with strip/append/condition; conditions compile to
  `cond.*` (prefix) / `.*cond` (suffix) and run as a FULL match over
  the RESTORED candidate stem (Dictionary.cs:70-71,565-578; `.` and
  cond==strip mean no condition).
- Cross-product prefix+suffix (a suffix stripped after a prefix needs
  the prefix flag on the dict entry OR in its own continuation
  classes — Stemmer.cs ApplyAffix), twofold suffixes via continuation
  classes (`twoStageAffix`), same-rule non-reapplication, and the
  recursion-depth ladder of Stemmer.cs Stem() (depth 0 -> 1 -> 2).
- FLAG long / FLAG num modes, AF flag aliases, homonym entries,
  FULLSTRIP, NEEDAFFIX, KEEPCASE (case-variant filtering incl. the
  upper -> title -> lower union of Stemmer.Stem), ONLYINCOMPOUND
  (affix and entry filtering), CIRCUMFIX pairing.
Not ported: compounding, ICONV/OCONV/IGNORE input cleaning,
COMPLEXPREFIXES (rare; the doPrefix ladder keeps its shape with it
hardwired false), morphological field output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Affix:
    flag: str
    strip: str
    append: str
    cont: frozenset[str]          # continuation classes on the append
    pattern: re.Pattern | None    # full-match over the restored stem
    cross: bool
    index: int                    # identity for same-rule suppression


class HunspellDictionary:
    """Parsed .aff + .dic pair (text contents, not paths)."""

    def __init__(self, aff: str, dic: str, ignore_case: bool = False):
        self.prefixes: list[Affix] = []
        self.suffixes: list[Affix] = []
        self.entries: dict[str, list[frozenset[str]]] = {}
        self.flag_mode = "char"
        self.aliases: list[frozenset[str]] = []
        self.fullstrip = False
        self.needaffix: str | None = None
        self.onlyincompound: str | None = None
        self.circumfix: str | None = None
        self.keepcase: str | None = None
        self.ignore_case = ignore_case
        self.two_stage = False
        self._n_rules = 0
        self._parse_aff(aff)
        self._parse_dic(dic)

    # -- flags --------------------------------------------------------------

    def _parse_flags(self, s: str) -> frozenset[str]:
        if not s:
            return frozenset()
        if self.aliases and s.isdigit():
            i = int(s)
            return self.aliases[i - 1] if 0 < i <= len(self.aliases) else frozenset()
        if self.flag_mode == "num":
            return frozenset(x.strip() for x in s.split(",") if x.strip())
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        return frozenset(s)

    def _single_flag(self, s: str) -> str:
        flags = sorted(self._parse_flags(s))
        return flags[0] if flags else s

    # -- .aff ---------------------------------------------------------------

    def _parse_aff(self, text: str) -> None:
        lines = [ln.rstrip("\n") for ln in text.splitlines()]
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char"
                )
            elif key == "AF" and len(parts) > 1 and parts[1].isdigit():
                count = int(parts[1])
                for _ in range(count):
                    p = lines[i].split()
                    i += 1
                    self.aliases.append(
                        self._parse_flags(p[1]) if len(p) > 1 else frozenset()
                    )
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key == "NEEDAFFIX" and len(parts) > 1:
                self.needaffix = self._single_flag(parts[1])
            elif key == "ONLYINCOMPOUND" and len(parts) > 1:
                self.onlyincompound = self._single_flag(parts[1])
            elif key == "CIRCUMFIX" and len(parts) > 1:
                self.circumfix = self._single_flag(parts[1])
            elif key == "KEEPCASE" and len(parts) > 1:
                self.keepcase = self._single_flag(parts[1])
            elif key in ("PFX", "SFX") and len(parts) >= 4 \
                    and parts[3].isdigit():
                flag_s, cross_s, count = parts[1], parts[2], int(parts[3])
                for _ in range(count):
                    rp = lines[i].split()
                    i += 1
                    self._add_rule(key, flag_s, cross_s == "Y", rp)

    def _add_rule(self, kind: str, flag_s: str, cross: bool, rp: list[str]):
        # rp: [PFX/SFX, flag, strip, append[/cont], [condition]]
        strip = "" if rp[2] == "0" else rp[2]
        app = rp[3]
        cont: frozenset[str] = frozenset()
        if "/" in app:
            app, _, cont_s = app.partition("/")
            cont = self._parse_flags(cont_s)
            if cont:
                self.two_stage = True
        if app == "0":
            app = ""
        cond = rp[4] if len(rp) > 4 else "."
        if cond.startswith("[") and "]" not in cond:
            cond += "]"
        pattern = None
        if cond != "." and cond != strip:
            body = cond.replace("-", r"\-") if "-" in cond else cond
            shape = f"{body}.*" if kind == "PFX" else f".*{body}"
            pattern = re.compile(shape, re.S)
        rule = Affix(
            flag=self._single_flag(flag_s), strip=strip, append=app,
            cont=cont, pattern=pattern, cross=cross, index=self._n_rules,
        )
        self._n_rules += 1
        (self.prefixes if kind == "PFX" else self.suffixes).append(rule)

    # -- .dic ---------------------------------------------------------------

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for ln in lines[1:] if lines and lines[0].strip().isdigit() else lines:
            ln = ln.split("\t", 1)[0].strip()   # drop morph fields
            if not ln or ln.startswith("#"):
                continue
            # split on unescaped slash
            m = re.match(r"^((?:[^\\/]|\\.)*)(?:/(.*))?$", ln)
            word = m.group(1).replace("\\/", "/")
            flags = self._parse_flags(m.group(2) or "")
            if self.ignore_case:
                word = word.lower()
            self.entries.setdefault(word, []).append(flags)


class HunspellStemmer:
    """Stemmer.cs semantics over a HunspellDictionary."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    # -- public -------------------------------------------------------------

    def stem(self, word: str) -> list[str]:
        d = self.d
        if d.ignore_case:
            word = word.lower()
        if word and word[0].isupper() and not d.ignore_case:
            rest = word[1:]
            if rest == rest.lower():
                kind = "title" if any(c.islower() for c in rest) or not rest \
                    else "upper"
            elif rest == rest.upper():
                kind = "upper"
            else:
                kind = "exact"
            if kind == "upper":
                title = word[0] + word[1:].lower()
                out = self._do_stem(word, False)
                out += self._do_stem(title, True)
                out += self._do_stem(word.lower(), True)
                return out
            if kind == "title":
                return self._do_stem(word, False) + \
                    self._do_stem(word.lower(), True)
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        seen: dict[str, None] = {}
        for s in self.stem(word):
            seen.setdefault(s, None)
        return list(seen)

    # -- internals ----------------------------------------------------------

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        d = self.d
        out = []
        for flags in d.entries.get(word, ()):
            if case_variant and d.keepcase is not None \
                    and d.keepcase in flags:
                continue
            if d.needaffix is not None and d.needaffix in flags:
                continue
            if d.onlyincompound is not None and d.onlyincompound in flags:
                continue
            out.append(word)
        out += self._stem(
            word, prev=None, prev_flag=None, prefix_flag=None, depth=0,
            do_prefix=True, do_suffix=True, prev_was_prefix=False,
            circumfix=False, case_variant=case_variant,
        )
        return out

    def _compatible(self, rule: Affix, depth: int, prev_flag,
                    match_empty: bool) -> bool:
        d = self.d
        if depth == 0:
            if d.onlyincompound is None:
                return True
            return d.onlyincompound not in rule.cont
        if rule.cross:
            if d.onlyincompound is not None \
                    and d.onlyincompound in rule.cont:
                return False
            return (not rule.cont and match_empty) or prev_flag in rule.cont
        return False

    def _stem(self, w, prev, prev_flag, prefix_flag, depth, do_prefix,
              do_suffix, prev_was_prefix, circumfix, case_variant):
        d = self.d
        out = []
        if do_prefix:
            limit = len(w) if d.fullstrip else len(w) - 1
            for rule in d.prefixes:
                la = len(rule.append)
                if la > limit or not w.startswith(rule.append):
                    continue
                if prev is not None and rule.index == prev.index:
                    continue
                if not self._compatible(rule, depth, prev_flag, False):
                    continue
                stripped = rule.strip + w[la:]
                if rule.pattern is not None \
                        and not rule.pattern.fullmatch(stripped):
                    continue
                out += self._apply(
                    stripped, rule, None, depth, True, circumfix,
                    case_variant,
                )
        if do_suffix:
            low = 0 if d.fullstrip else 1
            for rule in d.suffixes:
                la = len(rule.append)
                pos = len(w) - la
                if pos < low or not w.endswith(rule.append):
                    continue
                if prev is not None and rule.index == prev.index:
                    continue
                if not self._compatible(rule, depth, prev_flag,
                                        prev_was_prefix):
                    continue
                stripped = w[:pos] + rule.strip
                if rule.pattern is not None \
                        and not rule.pattern.fullmatch(stripped):
                    continue
                out += self._apply(
                    stripped, rule, prefix_flag, depth, False, circumfix,
                    case_variant,
                )
        return out

    def _apply(self, stripped, rule, prefix_flag, depth, is_prefix,
               circumfix, case_variant):
        d = self.d
        out = []
        for flags in d.entries.get(stripped, ()):
            if rule.flag not in flags:
                continue
            if prefix_flag is not None and prefix_flag not in flags \
                    and prefix_flag not in rule.cont:
                continue
            if d.circumfix is not None:
                if circumfix != (d.circumfix in rule.cont):
                    continue
            if case_variant and d.keepcase is not None \
                    and d.keepcase in flags:
                continue
            if d.onlyincompound is not None \
                    and d.onlyincompound in flags:
                continue
            out.append(stripped)
        if d.circumfix is not None and not circumfix and is_prefix:
            circumfix = d.circumfix in rule.cont
        if rule.cross:
            if depth == 0:
                if is_prefix:
                    out += self._stem(
                        stripped, rule, rule.flag, rule.flag, 1,
                        do_prefix=False, do_suffix=True,
                        prev_was_prefix=True, circumfix=circumfix,
                        case_variant=case_variant,
                    )
                elif d.two_stage:
                    out += self._stem(
                        stripped, rule, rule.flag, prefix_flag, 1,
                        do_prefix=False, do_suffix=True,
                        prev_was_prefix=False, circumfix=circumfix,
                        case_variant=case_variant,
                    )
            elif depth == 1 and not is_prefix and d.two_stage:
                out += self._stem(
                    stripped, rule, rule.flag, prefix_flag, 2,
                    do_prefix=False, do_suffix=True,
                    prev_was_prefix=False, circumfix=circumfix,
                    case_variant=case_variant,
                )
        return out


# ---------------------------------------------------------------------------
# Analyzer facade (HunspellStemFilter.cs, longestOnly mode)
# ---------------------------------------------------------------------------

def _make_longest_only(stemmer: HunspellStemmer):
    """HunspellStemFilter.cs longestOnly: longest stem wins, ties break
    on the lexicographically larger text (lengthComparer); a token with
    no stems passes through unchanged."""
    def stem(token: str) -> str:
        stems = stemmer.stem(token)
        if not stems:
            return token
        return max(stems, key=lambda s: (len(s), s))
    return stem


def hunspell_analyzer(aff: str, dic: str, stopwords=frozenset(), **kw):
    """Build a stop+Hunspell analyzer from .aff/.dic contents."""
    from lucenenet_spark.analysis.snowball import _SnowballAnalyzer

    stemmer = HunspellStemmer(HunspellDictionary(aff, dic))

    class _HunspellAnalyzer(_SnowballAnalyzer):
        _stem = staticmethod(_make_longest_only(stemmer))

    return _HunspellAnalyzer(stopwords, **kw)
