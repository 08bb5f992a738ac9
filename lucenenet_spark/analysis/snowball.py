"""Snowball stemmers (German, French, Spanish) + per-language routing.

Reference surface: SnowballFilter
(src/Lucene.Net.Analysis.Common/Analysis/Snowball/SnowballFilter.cs) wired
into GermanAnalyzer / FrenchAnalyzer
(Analysis/De/GermanAnalyzer.cs, Analysis/Fr/FrenchAnalyzer.cs), each with
its Snowball default stop set. The reference ships machine-generated
stemmer classes (Tartarus Snowball); here each stemmer is a direct Python
implementation of the PUBLISHED Snowball algorithm description
(M.F. Porter, snowballstem.org — "German stemming algorithm" and "French
stemming algorithm", classic editions), the same primary source the
generated code compiles. Correctness is pinned by fixture pairs in
tests/test_snowball.py derived by rule-tracing the published spec.

Routing: web-scale corpora are multilingual; the documents table carries a
`lang` column reserved for exactly this (SURVEY.md §2.2).
LanguageRoutedAnalyzer dispatches each document batch slice to its
language's analyzer inside the SAME zero-shuffle mapInArrow inversion pass
— one corpus scan, per-language filter chains, one unified index whose
terms are stemmed per their document's language (the Spark-first analogue
of routing documents to per-language IndexWriters).

Like EnglishAnalyzer/Porter, stemming runs over each batch's term
DICTIONARY (unique tokens), not per token: vocab << tokens, so the Python
stemmer cost is amortized to near-zero per posting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import (
    DEFAULT_MAX_TOKEN_LENGTH,
    StandardAnalyzer,
)

# ---------------------------------------------------------------------------
# Snowball default stop sets (the *_stop.txt lists the reference loads via
# WordlistLoader; function words only, public lists)
# ---------------------------------------------------------------------------
GERMAN_STOP_WORDS = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das dass derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn deren derer dessen dich dir du dies diese
diesem diesen dieser dieses doch dort durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
jenen jener jenes jetzt kann kein keine keinem keinen keiner keines können
könnte machen man manche manchem manchen mancher manches mein meine meinem
meinen meiner meines mit muss musste nach nicht nichts noch nun nur ob oder
ohne sehr sein seine seinem seinen seiner seines selbst sich sie ihnen sind
so solche solchem solchen solcher solches soll sollte sondern sonst über um
und uns unser unter viel vom von vor während war waren warst was weg weil
weiter welche welchem welchen welcher welches wenn werde werden wie wieder
will wir wird wirst wo wollen wollte würde würden zu zum zur zwar zwischen
""".split())

FRENCH_STOP_WORDS = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que
qui sa se ses son sur ta te tes toi ton tu un une vos votre vous c d j l à
m n s t y été étée étées étés étant étante étants étantes suis es est
sommes êtes sont serai seras sera serons serez seront serais serait
serions seriez seraient étais était étions étiez étaient fus fut fûmes
fûtes furent sois soit soyons soyez soient fusse fusses fût fussions
fussiez fussent ayant ayante ayantes ayants eu eue eues eus ai as avons
avez ont aurai auras aura aurons aurez auront aurais aurait aurions auriez
auraient avais avait avions aviez avaient eut eûmes eûtes eurent aie aies
ait ayons ayez aient eusse eusses eût eussions eussiez eussent
""".split())


def _r_after(w: str, start: int, vowels: frozenset[str]) -> int:
    """Start of the region after the first non-vowel following a vowel,
    scanning from `start` (the shared Snowball R1/R2 definition)."""
    n = len(w)
    i = start
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    return i + 1 if i < n else n


# ===========================================================================
# German
# ===========================================================================
_DE_VOWELS = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")  # valid s-endings
_DE_ST_END = frozenset("bdfghklmnt")  # valid st-endings (s-endings minus r)


def german_stem(word: str) -> str:
    """Snowball German stemmer (classic edition), rule-for-rule from the
    published description: ß→ss; mark intervocalic u/y as consonants; R1
    (start adjusted to >= 3) / R2; three suffix steps (declensional
    em/ern/er/e/en/es/s, verbal en/er/est/st, derivational
    end/ung/ig/ik/isch/lich/heit/keit); finally unmark and strip umlauts."""
    w = word.lower().replace("ß", "ss")
    # mark u/y between vowels as non-vowels (original-neighbor test)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and w[i - 1] in _DE_VOWELS and w[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)

    r1 = _r_after(w, 0, _DE_VOWELS)
    r2 = _r_after(w, r1, _DE_VOWELS)
    r1 = max(r1, 3)  # region before R1 must hold >= 3 letters

    # ---- step 1: longest of ern em er (a) | en es e (b) | s (c)
    for suf, grp in (("ern", "a"), ("em", "a"), ("er", "a"),
                     ("en", "b"), ("es", "b"), ("e", "b"), ("s", "c")):
        if w.endswith(suf):
            if grp == "c":
                if len(w) >= 2 and w[-2] in _DE_S_END and len(w) - 1 >= r1:
                    w = w[:-1]
            elif len(w) - len(suf) >= r1:
                w = w[: -len(suf)]
                if grp == "b" and w.endswith("niss"):
                    w = w[:-1]
            break

    # ---- step 2: longest of est (a) | en er (a) | st (b, valid st-ending
    # itself preceded by >= 3 letters)
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            if suf == "st":
                if len(w) >= 6 and w[-3] in _DE_ST_END and len(w) - 2 >= r1:
                    w = w[:-2]
            elif len(w) - len(suf) >= r1:
                w = w[: -len(suf)]
            break

    # ---- step 3: d-suffixes, longest first
    for suf in ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if suf in ("end", "ung"):
            if p >= r2:
                w = w[:p]
                if w.endswith("ig") and len(w) - 2 >= r2 and not w.endswith("eig"):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if p >= r2 and (p == 0 or w[p - 1] != "e"):
                w = w[:p]
        elif suf in ("lich", "heit"):
            if p >= r2:
                w = w[:p]
                for pre in ("er", "en"):
                    if w.endswith(pre) and len(w) - 2 >= r1:
                        w = w[:-2]
                        break
        else:  # keit
            if p >= r2:
                w = w[:p]
                for pre in ("lich", "ig"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        break

    return (
        w.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


# ===========================================================================
# French
# ===========================================================================
_FR_VOWELS = frozenset("aeiouyâàëéêèïîôûù")

# step-1 suffixes, longest-match order; action key per group
_FR_STEP1 = sorted(
    [
        ("ance", "del_r2"), ("iqUe", "del_r2"), ("isme", "del_r2"),
        ("able", "del_r2"), ("iste", "del_r2"), ("eux", "del_r2"),
        ("ances", "del_r2"), ("iqUes", "del_r2"), ("ismes", "del_r2"),
        ("ables", "del_r2"), ("istes", "del_r2"),
        ("atrice", "ateur"), ("ateur", "ateur"), ("ation", "ateur"),
        ("atrices", "ateur"), ("ateurs", "ateur"), ("ations", "ateur"),
        ("logie", "log"), ("logies", "log"),
        ("usion", "u"), ("ution", "u"), ("usions", "u"), ("utions", "u"),
        ("ence", "ent"), ("ences", "ent"),
        ("ement", "ement"), ("ements", "ement"),
        ("ité", "ite"), ("ités", "ite"),
        ("if", "if"), ("ive", "if"), ("ifs", "if"), ("ives", "if"),
        ("eaux", "eaux"), ("aux", "aux"),
        ("euse", "euse"), ("euses", "euse"),
        ("issement", "issement"), ("issements", "issement"),
        ("amment", "amment"), ("emment", "emment"),
        ("ment", "ment"), ("ments", "ment"),
    ],
    key=lambda x: -len(x[0]),
)

_FR_STEP2A = sorted(
    """îmes ît îtes i ie ies ir ira irai iraIent irais irait iras irent
    irez iriez irions irons iront is issaIent issais issait issant issante
    issantes issants isse issent isses issez issiez issions issons
    it""".split(),
    key=len, reverse=True,
)

_FR_STEP2B_ER = sorted(
    """é ée ées és èrent er era erai eraIent erais erait eras erez eriez
    erions erons eront ez iez""".split(),
    key=len, reverse=True,
)
_FR_STEP2B_A = sorted(
    """âmes ât âtes a ai aIent ais ait ant ante antes ants as asse assent
    asses assiez assions""".split(),
    key=len, reverse=True,
)


def _fr_mark(w: str) -> str:
    """Mark consonantal u/i/y (and u-after-q) as U/I/Y, original-neighbor
    semantics (jouer→joUer, ennuie→ennuIe, yeux→Yeux, quand→qUand)."""
    chars = list(w)
    n = len(chars)
    for i, c in enumerate(chars):
        prev_v = i > 0 and w[i - 1] in _FR_VOWELS
        next_v = i < n - 1 and w[i + 1] in _FR_VOWELS
        if c == "u":
            if (i > 0 and w[i - 1] == "q") or (prev_v and next_v):
                chars[i] = "U"
        elif c == "i":
            if prev_v and next_v:
                chars[i] = "I"
        elif c == "y":
            if prev_v or next_v:
                chars[i] = "Y"
    return "".join(chars)


def _fr_step1(w: str, rv: int, r1: int, r2: int) -> tuple[str, bool]:
    """Standard-suffix removal. Returns (word, ment_found)."""
    for suf, act in _FR_STEP1:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if act == "del_r2":
            if p >= r2:
                w = w[:p]
        elif act == "ateur":
            if p >= r2:
                w = w[:p]
                if w.endswith("ic"):
                    w = w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU"
        elif act == "log":
            if p >= r2:
                w = w[:p] + "log"
        elif act == "u":
            if p >= r2:
                w = w[:p] + "u"
        elif act == "ent":
            if p >= r2:
                w = w[:p] + "ent"
        elif act == "ement":
            if p >= rv:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") or w.endswith("iqU")) and len(w) - 3 >= r2:
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif act == "ite":
            if p >= r2:
                w = w[:p]
                if w.endswith("abil"):
                    w = w[:-4] if len(w) - 4 >= r2 else w[:-4] + "abl"
                elif w.endswith("ic"):
                    w = w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif act == "if":
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        w = w[:-2] if len(w) - 2 >= r2 else w[:-2] + "iqU"
        elif act == "eaux":
            w = w[:p] + "eau"
        elif act == "aux":
            if p >= r1:
                w = w[:p] + "al"
        elif act == "euse":
            if p >= r2:
                w = w[:p]
            elif p >= r1:
                w = w[:p] + "eux"
        elif act == "issement":
            if p >= r1 and p > 0 and w[p - 1] not in _FR_VOWELS:
                w = w[:p]
        elif act == "amment":
            if p >= rv:
                w = w[:p] + "ant"
            return w, True
        elif act == "emment":
            if p >= rv:
                w = w[:p] + "ent"
            return w, True
        elif act == "ment":
            if p >= rv and p > 0 and p - 1 >= rv and w[p - 1] in _FR_VOWELS:
                w = w[:p]
            return w, True
        return w, False
    return w, False


def _fr_step2a(w: str, rv: int) -> str:
    """Verb suffixes beginning i: longest match first, then the rule —
    delete if in RV and preceded by a non-vowel itself in RV. Snowball's
    among runs under `setlimit tomark pV`, so a suffix that starts before
    RV never matches at all — fall through to a shorter suffix wholly
    inside RV (mirrors the Spanish step-2b loop)."""
    for suf in _FR_STEP2A:
        if w.endswith(suf):
            p = len(w) - len(suf)
            if p < rv:
                continue  # suffix straddles the RV boundary: not a match
            if p - 1 >= rv and w[p - 1] not in _FR_VOWELS:
                return w[:p]
            return w
    return w


# union of the three 2b groups, longest-match order (Snowball picks the
# longest matching suffix across groups, then applies only ITS rule)
_FR_STEP2B = sorted(
    [("ions", "ions")]
    + [(s, "er") for s in _FR_STEP2B_ER]
    + [(s, "a") for s in _FR_STEP2B_A],
    key=lambda x: -len(x[0]),
)


def _fr_step2b(w: str, rv: int, r2: int) -> str:
    """Other verb suffixes (all tests confined to RV; ions also needs R2).
    As in step 2a, the among is limited to RV: a suffix starting before RV
    is skipped in favour of a shorter one wholly inside RV."""
    for suf, grp in _FR_STEP2B:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if p < rv:
            continue  # suffix straddles the RV boundary: not a match
        if grp == "ions":
            if p >= r2 and p >= rv:
                w = w[:p]
        elif grp == "er":
            if p >= rv:
                w = w[:p]
        else:  # a-group: delete; a preceding e (in RV) goes too
            if p >= rv:
                w = w[:p]
                if w.endswith("e") and len(w) - 1 >= rv:
                    w = w[:-1]
        return w
    return w


def french_stem(word: str) -> str:
    """Snowball French stemmer (classic edition), rule-for-rule from the
    published description: mark consonantal u/i/y, compute RV/R1/R2, step 1
    standard suffixes, steps 2a/2b verb suffixes, step 3 (Y→i, ç→c) or
    step 4 residual (s, ion, ier/ière, e), step 5 undouble, step 6
    un-accent; finally unmark."""
    w = _fr_mark(word.lower())
    n = len(w)
    if n >= 3 and (
        (w[0] in _FR_VOWELS and w[1] in _FR_VOWELS) or w[:3] in ("par", "col", "tap")
    ):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if w[i] in _FR_VOWELS:
                rv = i + 1
                break
    r1 = _r_after(w, 0, _FR_VOWELS)
    r2 = _r_after(w, r1, _FR_VOWELS)

    orig = w
    w, ment_found = _fr_step1(w, rv, r1, r2)
    step1_changed = w != orig

    if not step1_changed or ment_found:
        w2a = _fr_step2a(w, rv)
        if w2a != w:
            w, last_altered = w2a, True
        else:
            w2b = _fr_step2b(w, rv, r2)
            w, last_altered = w2b, w2b != w
    else:
        last_altered = True

    if last_altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4 residual suffix removal (tests confined to RV):
        # first the final-s rule, then the longest of ion/ier/ière/e/ë
        if w.endswith("s") and (len(w) < 2 or w[-2] not in "aiouès"):
            w = w[:-1]
        for suf in ("ière", "Ière", "ion", "ier", "Ier", "e", "ë"):
            if not w.endswith(suf):
                continue
            p = len(w) - len(suf)
            if p < rv:
                # among limited to RV: a straddling suffix is no match —
                # fall through to a shorter suffix wholly inside RV
                continue
            if suf == "ion":
                if p >= r2 and p >= rv and p - 1 >= rv and p > 0 and w[p - 1] in "st":
                    w = w[:p]
            elif suf in ("e", "ë"):
                if p >= rv and (suf == "e" or w.endswith("guë")):
                    w = w[:p]
            else:  # ier / ière variants -> i
                if p >= rv:
                    w = w[:p] + "i"
            break

    # step 5: undouble
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break
    # step 6: un-accent é/è followed only by non-vowels at the end
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        if w[i] in _FR_VOWELS or w[i] in "éè":
            break
        seen_nonvowel = True
        i -= 1
    if seen_nonvowel and i >= 0 and w[i] in "éè":
        w = w[:i] + "e" + w[i + 1:]

    return w.replace("U", "u").replace("I", "i").replace("Y", "y")


# ===========================================================================
# Analyzers + language routing
# ===========================================================================
class _SnowballAnalyzer(StandardAnalyzer):
    """StandardTokenizer + LowerCase + language Stop set + Snowball stem —
    the GermanAnalyzer/FrenchAnalyzer CreateComponents chain. Stemming is
    applied to the batch's unique-token dictionary (EnglishAnalyzer
    pattern)."""

    _stem = staticmethod(lambda t: t)

    def __init__(self, stopwords, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
        super().__init__(stopwords=stopwords, max_token_length=max_token_length,
                         lowercase=True)

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        if len(terms):
            codes, uniques = pd.factorize(pd.Series(terms), sort=False)
            stemmed = np.array([self._stem(u) for u in uniques], dtype=object)
            terms = stemmed[codes]
        return row_idx, terms, positions, field_lens

    def tokenize_batch_arrow(self, texts):  # pragma: no cover - explicit
        raise NotImplementedError("stemmed path uses the pandas batch API")

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


class GermanAnalyzer(_SnowballAnalyzer):
    """Analysis/De/GermanAnalyzer.cs analogue (stop set + Snowball German;
    the reference's GermanNormalizationFilter umlaut folding is subsumed by
    the stemmer's final unumlaut step)."""

    _stem = staticmethod(german_stem)

    def __init__(self, stopwords=GERMAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class FrenchAnalyzer(_SnowballAnalyzer):
    """Analysis/Fr/FrenchAnalyzer.cs analogue (stop set + Snowball French;
    ElisionFilter's l'/d'/qu' splitting is handled by the tokenizer, which
    breaks on apostrophes for this corpus alphabet)."""

    _stem = staticmethod(french_stem)

    def __init__(self, stopwords=FRENCH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class LanguageRoutedAnalyzer:
    """Per-document-language analyzer dispatch inside ONE inversion pass.

    `analyzers` maps lang-column values to analyzers; unmatched values use
    `default`. The index builder sees `routing_col` and feeds
    tokenize_batch_routed(texts, langs); each batch is sliced by language
    and delegated — rows keep their batch-global indices, so the downstream
    zero-shuffle (row, term) aggregation is unchanged. At 100 TB this adds
    no shuffle and no extra scan: routing is a per-batch partition of rows.
    """

    def __init__(self, analyzers: dict[str, StandardAnalyzer],
                 default: StandardAnalyzer | None = None,
                 routing_col: str = "lang"):
        self.analyzers = dict(analyzers)
        self.default = default or StandardAnalyzer()
        self.routing_col = routing_col

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False

    def analyzer_for_lang(self, lang: str | None) -> StandardAnalyzer:
        return self.analyzers.get(lang or "", self.default)

    def tokenize_batch_routed(self, texts: pd.Series, langs: pd.Series):
        texts = texts.reset_index(drop=True)
        langs = langs.reset_index(drop=True).fillna("")
        n_rows = len(texts)
        parts = []
        field_lens = np.zeros(n_rows, dtype=np.int32)
        for lang in pd.unique(langs):
            rows = np.flatnonzero((langs == lang).to_numpy())
            az = self.analyzer_for_lang(lang)
            r, t, p, fl = az.tokenize_batch(texts.iloc[rows].reset_index(drop=True))
            field_lens[rows] = fl
            if len(t):
                parts.append((rows[r], t, p))
        if not parts:
            return (
                np.array([], dtype=np.int64),
                np.array([], dtype=object),
                np.array([], dtype=np.int32),
                field_lens,
            )
        row_idx = np.concatenate([x[0] for x in parts])
        terms = np.concatenate([x[1] for x in parts])
        positions = np.concatenate([x[2] for x in parts])
        return row_idx, terms, positions, field_lens

    def tokenize_batch(self, texts: pd.Series):
        """Routing-free fallback (no lang available): default analyzer."""
        return self.default.tokenize_batch(texts)

    def tokenize_text(self, text: str, lang: str | None = None):
        az = self.analyzer_for_lang(lang)
        return az.tokenize_text(text)

    def terms(self, text: str, lang: str | None = None) -> list[str]:
        return [t for t, _ in self.tokenize_text(text, lang)]


# ===========================================================================
# Spanish
# ===========================================================================
SPANISH_STOP_WORDS = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre también
me hasta hay donde quien desde todo nos durante todos uno les ni contra
otros ese eso ante ellos e esto mí antes algunos qué unos yo otro otras
otra él tanto esa estos mucho quienes nada muchos cual poco ella estar
estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras vosotros
vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya suyos suyas
nuestro nuestra nuestros nuestras vuestro vuestra vuestros vuestras esos
esas estoy estás está estamos estáis están esté estés estemos estéis estén
estaré estarás estará estaremos estaréis estarán estaría estarías
estaríamos estaríais estarían estaba estabas estábamos estabais estaban
estuve estuviste estuvo estuvimos estuvisteis estuvieron estuviera
estuvieras estuviéramos estuvierais estuvieran estuviese estuvieses
estuviésemos estuvieseis estuviesen estando estado estada estados estadas
estad he has ha hemos habéis han haya hayas hayamos hayáis hayan habré
habrás habrá habremos habréis habrán habría habrías habríamos habríais
habrían había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran hubiese
hubieses hubiésemos hubieseis hubiesen habiendo habido habida habidos
habidas soy eres es somos sois son sea seas seamos seáis sean seré serás
será seremos seréis serán sería serías seríamos seríais serían era eras
éramos erais eran fui fuiste fue fuimos fuisteis fueron fuera fueras
fuéramos fuerais fueran fuese fueses fuésemos fueseis fuesen siendo sido
tengo tienes tiene tenemos tenéis tienen tenga tengas tengamos tengáis
tengan tendré tendrás tendrá tendremos tendréis tendrán tendría tendrías
tendríamos tendríais tendrían tenía tenías teníamos teníais tenían tuve
tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras tuviéramos
tuvierais tuvieran tuviese tuvieses tuviésemos tuvieseis tuviesen teniendo
tenido tenida tenidos tenidas tened
""".split())

_ES_VOWELS = frozenset("aeiouáéíóúü")

_ES_STEP0_PRON = sorted(
    "me se sela selo selas selos la le lo las les los nos".split(),
    key=len, reverse=True,
)
_ES_STEP0_A = sorted(["iéndo", "ándo", "ár", "ér", "ír"], key=len, reverse=True)
_ES_STEP0_B = sorted(["iendo", "ando", "ar", "er", "ir"], key=len, reverse=True)

_ES_STEP1 = sorted(
    [
        # (suffix, action)
        *[(s, "del_r2") for s in """anza anzas ico ica icos icas ismo ismos
          able ables ible ibles ista istas oso osa osos osas amiento
          amientos imiento imientos""".split()],
        *[(s, "ador") for s in """adora ador ación adoras adores aciones
          ante antes ancia ancias""".split()],
        ("logía", "log"), ("logías", "log"),
        ("ución", "u"), ("uciones", "u"),
        ("encia", "ente"), ("encias", "ente"),
        ("amente", "amente"), ("mente", "mente"),
        ("idad", "idad"), ("idades", "idad"),
        *[(s, "iv") for s in "iva ivo ivas ivos".split()],
    ],
    key=lambda x: -len(x[0]),
)

_ES_STEP2A = sorted(
    "ya ye yan yen yeron yendo yo yó yas yes yais yamos".split(),
    key=len, reverse=True,
)
_ES_STEP2B_GU = sorted("en es éis emos".split(), key=len, reverse=True)
_ES_STEP2B = sorted(
    """arían arías arán arás aríais aría aréis aríamos aremos ará aré
    erían erías erán erás eríais ería eréis eríamos eremos erá eré irían
    irías irán irás iríais iría iréis iríamos iremos irá iré aba ada ida
    ía ara iera ad ed id ase iese aste iste an aban ían aran ieran asen
    iesen aron ieron ado ido ando iendo ió ar er ir as abas adas idas ías
    aras ieras ases ieses ís áis abais íais arais ierais aseis ieseis
    asteis isteis ados idos amos ábamos íamos imos áramos iéramos iésemos
    ásemos""".split(),
    key=len, reverse=True,
)
_ES_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        # after the next following vowel
        for i in range(2, n):
            if w[i] in _ES_VOWELS:
                return i + 1
        return n
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        # after the next consonant
        for i in range(2, n):
            if w[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3  # consonant-vowel start


def spanish_stem(word: str) -> str:
    """Snowball Spanish stemmer (classic edition), rule-for-rule from the
    published description: RV/R1/R2 regions, step 0 attached pronouns,
    step 1 standard suffixes, steps 2a/2b verb suffixes, step 3 residual
    vowels, final de-accenting."""
    w = word.lower()
    rv = _es_rv(w)
    r1 = _r_after(w, 0, _ES_VOWELS)
    r2 = _r_after(w, r1, _ES_VOWELS)

    # ---- step 0: attached pronoun after a gerund/infinitive ending
    for suf in _ES_STEP0_PRON:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if p < rv:
            break
        stem = w[:p]
        done = False
        # the gerund/infinitive ending must itself lie in RV (published
        # step 0: "...in RV"; only (c)'s preceding u may fall outside)
        for a in _ES_STEP0_A:
            if stem.endswith(a) and len(stem) - len(a) >= rv:
                w = stem[: -len(a)] + a.translate(_ES_UNACCENT)
                done = True
                break
        if not done:
            for b in _ES_STEP0_B:
                if stem.endswith(b) and len(stem) - len(b) >= rv:
                    w = stem
                    done = True
                    break
        if not done and stem.endswith("yendo") and len(stem) - 5 >= rv \
                and len(stem) >= 6 and stem[-6] == "u":
            w = stem
        break

    # ---- step 1: standard suffix removal (longest match, then its rule)
    orig = w
    for suf, act in _ES_STEP1:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if act == "del_r2":
            if p >= r2:
                w = w[:p]
        elif act == "ador":
            if p >= r2:
                w = w[:p]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif act == "log":
            if p >= r2:
                w = w[:p] + "log"
        elif act == "u":
            if p >= r2:
                w = w[:p] + "u"
        elif act == "ente":
            if p >= r2:
                w = w[:p] + "ente"
        elif act == "amente":
            if p >= r1:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif act == "mente":
            if p >= r2:
                w = w[:p]
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif act == "idad":
            if p >= r2:
                w = w[:p]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif act == "iv":
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        break

    step1_changed = w != orig
    if not step1_changed:
        # ---- step 2a: verb suffixes beginning y (preceded by u, in RV)
        w2 = w
        for suf in _ES_STEP2A:
            if w.endswith(suf):
                p = len(w) - len(suf)
                if p >= rv and p > 0 and w[p - 1] == "u":
                    w2 = w[:p]
                break
        if w2 != w:
            w = w2
        else:
            # ---- step 2b: longest match across both groups
            best = None
            for suf in _ES_STEP2B_GU:
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    best = (suf, "gu")
                    break
            for suf in _ES_STEP2B:
                if w.endswith(suf) and len(w) - len(suf) >= rv:
                    if best is None or len(suf) > len(best[0]):
                        best = (suf, "")
                    break
            if best is not None:
                suf, grp = best
                w = w[: len(w) - len(suf)]
                if grp == "gu" and w.endswith("gu"):
                    w = w[:-1]

    # ---- step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if w.endswith(suf):
            p = len(w) - len(suf)
            if p >= rv:
                w = w[:p]
                if suf in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
                    w = w[:-1]
            break

    return w.translate(_ES_UNACCENT)


class SpanishAnalyzer(_SnowballAnalyzer):
    """Analysis/Es/SpanishAnalyzer.cs analogue (stop set + Snowball
    Spanish)."""

    _stem = staticmethod(spanish_stem)

    def __init__(self, stopwords=SPANISH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
