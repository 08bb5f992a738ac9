"""Light-stemmer language packs: Arabic, Persian, Hindi, Indonesian,
Czech, Bulgarian.

These are the reference's non-Snowball affix-stripping analyzers, each a
published algorithm re-implemented from its specification:

- Arabic: Larkey, Ballesteros & Connell, "Light Stemming for Arabic
  Information Retrieval" (Light-10) — normalization + definite-article /
  conjunction prefixes + common suffixes
  (reference: Analysis/Ar/ArabicNormalizer.cs:30-104,
  Analysis/Ar/ArabicStemmer.cs:36-189).
- Persian: normalization only in the analyzer chain (farsi yeh / keheh /
  heh variants), plus the standalone light suffix stemmer
  (Analysis/Fa/PersianNormalizer.cs:25-92, PersianStemmer.cs:25-118).
- Hindi: Ramanathan & Rao, "A Lightweight Stemmer for Hindi" + the
  IndicNormalizer nukta/matra folding subset
  (Analysis/Hi/HindiNormalizer.cs:30-188, HindiStemmer.cs:25-130).
- Indonesian: Tala, "A Study of Stemming Effects on Information
  Retrieval in Bahasa Indonesia" (inflectional + derivational affixes
  with prefix-suffix compatibility flags)
  (Analysis/Id/IndonesianStemmer.cs:22-344).
- Czech: Dolamic & Savoy light stemmer (case + possessive endings +
  palatalization normalization) (Analysis/Cz/CzechStemmer.cs:25-195).
- Bulgarian: Nakov, BulStem-light (definite article + plural endings)
  (Analysis/Bg/BulgarianStemmer.cs:25-184).

Stemming runs at the batch's unique-term dictionary (the same
`_SnowballAnalyzer` pattern — O(|vocab|) Python per Arrow batch, never
per posting), so the hot inversion path stays vectorized.

Stop sets are curated subsets of each language's highest-frequency
function words (the reference embeds full snowball/Savoy lists; ours are
documented subsets — parity is at gate granularity, pinned by the
fixture pairs in tests/test_light_stemmers.py). Per the reference's
ArabicAnalyzer.cs:139 comment, stop filtering happens BEFORE
normalization, which matches this framework's stop-at-tokenize order.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer

# ===========================================================================
# Arabic (Light-10)
# ===========================================================================

# tatweel + harakat (diacritics) — deleted
_AR_DELETE = frozenset("ـًٌٍَُِّْ")
# hamza-seated alefs -> bare alef; dotless yeh -> yeh; teh marbuta -> heh
_AR_FOLD = {
    "آ": "ا",
    "أ": "ا",
    "إ": "ا",
    "ى": "ي",
    "ة": "ه",
}

# definite article + conjunction/preposition fusions, longest-ish first;
# only the FIRST match strips (ArabicStemmer.StemPrefix)
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
# common suffixes, each stripped IN SEQUENCE if enough stem remains
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")

ARABIC_STOP_WORDS = frozenset(
    "في من على أن إلى عن مع هذا هذه ذلك التي الذي هو هي ما لا لم لن قد "
    "كان كانت أو ثم حتى إذا كل بين عند لكن و أي بعد قبل غير حيث منذ".split()
)


def arabic_normalize(word: str) -> str:
    """ArabicNormalizer.cs:67-102: fold alef/yeh/teh-marbuta variants,
    delete tatweel + harakat."""
    return "".join(_AR_FOLD.get(c, c) for c in word if c not in _AR_DELETE)


def arabic_stem(word: str) -> str:
    """ArabicStemmer.cs Stem = StemPrefix (first match only, with
    minimum-remainder guards: the waw conjunction needs len>=4, others
    len>=plen+2) then StemSuffix (every suffix in list order, each
    needing 2 chars of stem left)."""
    for p in _AR_PREFIXES:
        if word.startswith(p):
            if len(p) == 1:
                if len(word) < 4:
                    continue
            elif len(word) < len(p) + 2:
                continue
            word = word[len(p):]
            break
    for s in _AR_SUFFIXES:
        if word.endswith(s) and len(word) >= len(s) + 2:
            word = word[: -len(s)]
    return word


# ===========================================================================
# Persian
# ===========================================================================

_FA_FOLD = {
    "ی": "ي",  # farsi yeh -> yeh
    "ے": "ي",  # yeh barree -> yeh
    "ک": "ك",  # keheh -> kaf
    "ۀ": "ه",  # heh+yeh -> heh
    "ہ": "ه",  # heh goal -> heh
}
_FA_DELETE = frozenset("ٔ")  # hamza above

# suffix list in PersianStemmer.cs order (post-normalization forms: the
# analyzer chain runs ArabicNormalizer+PersianNormalizer first, so yeh
# here is U+064A)
_FA_SUFFIXES = ("ات", "ان",
                "ترين", "تر",
                "يي", "ي", "ها", "‌")

PERSIAN_STOP_WORDS = frozenset(
    "و در به از که این آن با برای است بود شد می ها های تا بر هم نیز اگر "
    "اما یا هر چه را یک ما من تو او شما آنها خود بی پس چون".split()
)


def persian_normalize(word: str) -> str:
    """ArabicNormalizer + PersianNormalizer.cs:45-71 (the analyzer runs
    both): farsi yeh/yeh barree -> yeh, keheh -> kaf, heh variants ->
    heh, drop hamza-above."""
    word = arabic_normalize(word)
    return "".join(_FA_FOLD.get(c, c) for c in word if c not in _FA_DELETE)


def persian_stem(word: str) -> str:
    """PersianStemmer.cs:66-92: every suffix in list order, each removed
    when >=2 chars of stem would remain."""
    for s in _FA_SUFFIXES:
        if word.endswith(s) and len(word) >= len(s) + 2:
            word = word[: -len(s)]
    return word


# ===========================================================================
# Hindi
# ===========================================================================

_HI_FOLD = {
    "ँ": "ं",  # candrabindu -> anusvara
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ", "आ": "अ",
    "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = frozenset("़‍‌्")  # nukta, ZWJ/ZWNJ, virama

_HI_SUFFIX_GROUPS = (
    # (min len AFTER which the strip applies as len > N, strip, suffixes)
    (6, 5, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")),
    (5, 4, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
            "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
            "ियों", "ियां")),
    (4, 3, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
            "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
            "ुआं")),
    (3, 2, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
            "ता", "ाँ", "ां", "ों", "ें")),
    (2, 1, ("ो", "े", "ू", "ु", "ी", "ि", "ा")),
)

HINDI_STOP_WORDS = frozenset(
    "के का की को में है हैं यह वह पर से ने और एक भी नहीं तो ही था थी थे "
    "कि जो हो इस उस कुछ अब जब तक या फिर हम आप".split()
)


def hindi_normalize(word: str) -> str:
    """HindiNormalizer.cs:40-180: nasal n+virama -> anusvara,
    candrabindu -> anusvara, drop nukta/virama/ZW(N)J, fold nukta
    consonants, long->short matras, candra vowels -> standard."""
    out = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        if c == "न" and i + 1 < n and word[i + 1] == "्":
            out.append("ं")
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_FOLD.get(c, c))
        i += 1
    return "".join(out)


def hindi_stem(word: str) -> str:
    """HindiStemmer.cs:31-126: longest-first suffix groups, one strip,
    each gated on len > suffix_len + 1."""
    n = len(word)
    for min_gt, strip, suffixes in _HI_SUFFIX_GROUPS:
        if n > min_gt and any(word.endswith(s) for s in suffixes):
            return word[:-strip]
    return word


# ===========================================================================
# Indonesian (Tala)
# ===========================================================================

INDONESIAN_STOP_WORDS = frozenset(
    "yang dan di ke dari untuk pada dengan ini itu adalah tidak akan ada "
    "atau juga saya kami kita mereka dia ia sebagai dalam oleh karena "
    "bahwa telah sudah bisa dapat anda belum hanya lebih harus para".split()
)

_ID_VOWELS = frozenset("aeiou")


def indonesian_stem(word: str, derivational: bool = True) -> str:
    """IndonesianStemmer.cs:40-343. Syllable count = vowel count; every
    removal decrements it and rules only fire while > 2. Inflectional:
    particles (kah/lah/pun) then possessives (ku/mu/nya). Derivational:
    first-order prefix (meng/meny/men/mem/me/peng/peny/pen/pem/di/ter/ke
    with recoding meny+V -> s, pen+V -> t), then — only if one fired —
    suffix then second-order prefix; otherwise second-order prefix
    (ber/bel/be..er/per/pel/pe) then suffix, with the reference's
    prefix-suffix compatibility flags (e.g. -kan won't strip after ke-
    or peng-)."""
    syll = sum(1 for c in word if c in _ID_VOWELS)
    flags = 0
    K_KE, K_PENG, K_DI, K_MENG, K_TER, K_BER, K_PE = 1, 2, 4, 8, 16, 32, 64

    if syll > 2 and (word.endswith("kah") or word.endswith("lah")
                     or word.endswith("pun")):
        syll -= 1
        word = word[:-3]
    if syll > 2:
        if word.endswith("ku") or word.endswith("mu"):
            syll -= 1
            word = word[:-2]
        elif word.endswith("nya"):
            syll -= 1
            word = word[:-3]
    if not derivational:
        return word

    def first_order(w):
        nonlocal syll, flags
        if w.startswith("meng"):
            flags |= K_MENG; syll -= 1; return w[4:]
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= K_MENG; syll -= 1; return "s" + w[4:]
        if w.startswith("men"):
            flags |= K_MENG; syll -= 1; return w[3:]
        if w.startswith("mem"):
            flags |= K_MENG; syll -= 1; return w[3:]
        if w.startswith("me"):
            flags |= K_MENG; syll -= 1; return w[2:]
        if w.startswith("peng"):
            flags |= K_PENG; syll -= 1; return w[4:]
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            flags |= K_PENG; syll -= 1; return "s" + w[4:]
        if w.startswith("peny"):
            flags |= K_PENG; syll -= 1; return w[4:]
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            flags |= K_PENG; syll -= 1; return "t" + w[3:]
        if w.startswith("pen"):
            flags |= K_PENG; syll -= 1; return w[3:]
        if w.startswith("pem"):
            flags |= K_PENG; syll -= 1; return w[3:]
        if w.startswith("di"):
            flags |= K_DI; syll -= 1; return w[2:]
        if w.startswith("ter"):
            flags |= K_TER; syll -= 1; return w[3:]
        if w.startswith("ke"):
            flags |= K_KE; syll -= 1; return w[2:]
        return w

    def second_order(w):
        nonlocal syll, flags
        if w.startswith("ber"):
            flags |= K_BER; syll -= 1; return w[3:]
        if w == "belajar":
            flags |= K_BER; syll -= 1; return w[3:]
        if (w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS
                and w[3] == "e" and w[4] == "r"):
            flags |= K_BER; syll -= 1; return w[2:]
        if w.startswith("per"):
            syll -= 1; return w[3:]
        if w == "pelajar":
            syll -= 1; return w[3:]
        if w.startswith("pe"):
            flags |= K_PE; syll -= 1; return w[2:]
        return w

    def suffix(w):
        nonlocal syll
        if (w.endswith("kan") and not flags & K_KE and not flags & K_PENG
                and not flags & K_PE):
            syll -= 1; return w[:-3]
        if (w.endswith("an") and not flags & K_DI and not flags & K_MENG
                and not flags & K_TER):
            syll -= 1; return w[:-2]
        if (w.endswith("i") and not w.endswith("si") and not flags & K_BER
                and not flags & K_KE and not flags & K_PENG):
            syll -= 1; return w[:-1]
        return w

    old = word
    if syll > 2:
        word = first_order(word)
    if word != old:  # a first-order rule fired -> suffix, then second-order
        old = word
        if syll > 2:
            word = suffix(word)
        if word != old and syll > 2:
            word = second_order(word)
    else:
        if syll > 2:
            word = second_order(word)
        if syll > 2:
            word = suffix(word)
    return word


# ===========================================================================
# Czech (Dolamic & Savoy light)
# ===========================================================================

CZECH_STOP_WORDS = frozenset(
    "a aby ale ani ano až bez bude by byl byla bylo co což do ho i já jak "
    "jako je jeho jej její jen ještě ji jiné již jsem jsi jsou k kam kde "
    "kdo když ke která které kteří který má mezi mi mně můj my na nad nám "
    "nás ne nebo než ní nic o od on ona oni pak po pod podle pokud pouze "
    "právě před přes při pro proč proto protože první s se si své ta tak "
    "také tam té tedy ten to tom tomto tu tuto ty u už v vám ve více však "
    "z za že".split()
)

_CZ_CASE_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_CASE_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CZ_CASE_1 = frozenset("aeiouůyáéíýě")


def czech_stem(word: str) -> str:
    """CzechStemmer.cs:35-194: remove case ending (longest first), then
    possessive (ov/in/ův), then palatalization normalization (čt->ck,
    št->sk, c/č->k, z/ž->h, e-elision, ů->o)."""
    n = len(word)
    # --- case endings ---
    if n > 7 and word.endswith("atech"):
        word = word[:-5]
    elif n > 6 and (word.endswith("ětem") or word.endswith("etem")
                    or word.endswith("atům")):
        word = word[:-4]
    elif n > 5 and word.endswith(_CZ_CASE_3):
        word = word[:-3]
    elif n > 4 and word.endswith(_CZ_CASE_2):
        word = word[:-2]
    elif n > 3 and word[-1] in _CZ_CASE_1:
        word = word[:-1]
    # --- possessives ---
    if len(word) > 5 and (word.endswith("ov") or word.endswith("in")
                          or word.endswith("ův")):
        word = word[:-2]
    # --- palatalization normalize ---
    if not word:
        return word
    if word.endswith("čt"):
        return word[:-2] + "ck"
    if word.endswith("št"):
        return word[:-2] + "sk"
    if word[-1] in "cč":
        return word[:-1] + "k"
    if word[-1] in "zž":
        return word[:-1] + "h"
    if len(word) > 1 and word[-2] == "e":
        return word[:-2] + word[-1]
    if len(word) > 2 and word[-2] == "ů":
        return word[:-2] + "o" + word[-1]
    return word


# ===========================================================================
# Bulgarian (BulStem light)
# ===========================================================================

BULGARIAN_STOP_WORDS = frozenset(
    "а без би бил била било в вас ваш вече ви вие всички всичко г да дали "
    "до е за зад и из или им има как както какво като кога когато което "
    "които кой който къде където към ли ме между мен ми мога може моля му "
    "на над най нас не него нея ни ние никой но някои някой няма о обаче "
    "около освен от отново още пак по повече под поне пред преди през при "
    "пък с са само се сега си след сме според сред срещу сте съм със също "
    "т тази така такъв там те тези ти то това този той трябва тук тя "
    "тях у че ще щом я".split()
)

_BG_ARTICLE_2 = ("ът", "то", "те", "та", "ия")


def bulgarian_stem(word: str) -> str:
    """BulgarianStemmer.cs:31-183: skip <4 chars; strip -ища; remove
    definite article, plural endings (with е->я / ц->к / з->г / с->х
    recodings), trailing я/а/о/е, -ен -> -н, and ъN -> N."""
    if len(word) < 4:
        return word
    if len(word) > 5 and word.endswith("ища"):
        return word[:-3]
    # --- article ---
    n = len(word)
    if n > 6 and word.endswith("ият"):
        word = word[:-3]
    elif n > 5 and word.endswith(_BG_ARTICLE_2):
        word = word[:-2]
    elif n > 4 and word.endswith("ят"):
        word = word[:-2]
    # --- plural ---
    n = len(word)
    if n > 6 and word.endswith("овци"):
        word = word[:-3]
    elif n > 6 and word.endswith("ове"):
        word = word[:-3]
    elif n > 6 and word.endswith("еве"):
        word = word[:-3] + "й"
    elif n > 5 and word.endswith("ища"):
        word = word[:-3]
    elif n > 5 and word.endswith("та"):
        word = word[:-2]
    elif n > 5 and word.endswith("ци"):
        word = word[:-2] + "к"
    elif n > 5 and word.endswith("зи"):
        word = word[:-2] + "г"
    elif n > 5 and word[-3] == "е" and word[-1] == "и":
        word = word[:-3] + "я" + word[-2]
    elif n > 4 and word.endswith("си"):
        word = word[:-2] + "х"
    elif n > 4 and word.endswith("и"):
        word = word[:-1]
    # --- trailing vowels ---
    if len(word) > 3:
        if word.endswith("я"):
            word = word[:-1]
        if len(word) > 3 and word[-1] in "аое":
            word = word[:-1]
    if len(word) > 4 and word.endswith("ен"):
        word = word[:-2] + "н"
    if len(word) > 5 and word[-2] == "ъ":
        word = word[:-2] + word[-1]
    return word


# ===========================================================================
# Analyzers (stop -> normalize -> stem at the term dictionary, the
# _SnowballAnalyzer unique-token pattern)
# ===========================================================================


class ArabicAnalyzer(_SnowballAnalyzer):
    """Analysis/Ar/ArabicAnalyzer.cs analogue: stop (surface forms,
    pre-normalization per the reference comment) -> normalize -> Light-10
    stem."""

    _stem = staticmethod(lambda t: arabic_stem(arabic_normalize(t)))

    def __init__(self, stopwords=ARABIC_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class PersianAnalyzer(_SnowballAnalyzer):
    """Analysis/Fa/PersianAnalyzer.cs analogue: stop + Arabic/Persian
    normalization (the reference chain has no stemmer; persian_stem is
    the standalone PersianStemFilter for callers that want it)."""

    _stem = staticmethod(persian_normalize)

    def __init__(self, stopwords=PERSIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class HindiAnalyzer(_SnowballAnalyzer):
    """Analysis/Hi/HindiAnalyzer.cs analogue: stop -> Indic/Hindi
    normalization -> light stem. Deviation noted: the reference stops
    AFTER normalization; ours stops at tokenize (curated stop set is
    already in surface form)."""

    _stem = staticmethod(lambda t: hindi_stem(hindi_normalize(t)))

    def __init__(self, stopwords=HINDI_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class IndonesianAnalyzer(_SnowballAnalyzer):
    """Analysis/Id/IndonesianAnalyzer.cs analogue (stop + Tala stemmer,
    derivational by default)."""

    _stem = staticmethod(indonesian_stem)

    def __init__(self, stopwords=INDONESIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class CzechAnalyzer(_SnowballAnalyzer):
    """Analysis/Cz/CzechAnalyzer.cs analogue (stop + Dolamic-Savoy light
    stemmer)."""

    _stem = staticmethod(czech_stem)

    def __init__(self, stopwords=CZECH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class BulgarianAnalyzer(_SnowballAnalyzer):
    """Analysis/Bg/BulgarianAnalyzer.cs analogue (stop + BulStem-light)."""

    _stem = staticmethod(bulgarian_stem)

    def __init__(self, stopwords=BULGARIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


# ===========================================================================
# Latvian (Latvian light stemmer)
# ===========================================================================

LATVIAN_STOP_WORDS = frozenset(
    "un ar es tu viņš viņa mēs jūs viņi tas tā šis šī kas kurš kura ka "
    "bet vai uz no pie par pēc pirms līdz kad tad ja ne nav ir bija būs "
    "būt tikai arī vēl jau kā šeit tur visi viss sava savs".split()
)

_LV_VOWELS = frozenset("aeiouāīēū")
# (suffix, suffix vowel count, palatalizes) — checked in order, first
# match strips (LatvianStemmer.cs affixes table)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False),
    ("ajam", 2, False), ("ajām", 2, False),
    ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False),
    ("ais", 2, False), ("ai", 2, False),
    ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False),
    ("īm", 1, False), ("im", 1, False),
    ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False),
    ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False),
    ("ie", 1, False), ("u", 1, True),
    ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False),
    ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    """LatvianStemmer.cs Unpalatalize: s[len] is the first removed char,
    so the kš/ņņ recodings only fire when the stripped suffix began with
    'u' (us/u endings)."""
    if removed_first == "u":
        if stem.endswith("kš"):
            return stem[:-1] + "st"
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    if stem.endswith("šņ"):
        return stem[:-2] + "sn"
    if stem.endswith("žņ"):
        return stem[:-2] + "zn"
    if stem.endswith("šļ"):
        return stem[:-2] + "sl"
    if stem.endswith("žļ"):
        return stem[:-2] + "zl"
    if stem.endswith("ļņ"):
        return stem[:-2] + "ln"
    if stem.endswith("ļļ"):
        return stem[:-2] + "ll"
    if stem.endswith("č"):
        return stem[:-1] + "c"
    if stem.endswith("ļ"):
        return stem[:-1] + "l"
    if stem.endswith("ņ"):
        return stem[:-1] + "n"
    return stem


def latvian_stem(word: str) -> str:
    """LatvianStemmer.cs:35-216: first affix (in table order) whose
    vowel count is strictly below the word's total vowel count and that
    leaves >= 3 chars strips; palatalizing affixes then fire the
    unpalatalization recodings."""
    nv = sum(1 for c in word if c in _LV_VOWELS)
    for affix, vc, palat in _LV_AFFIXES:
        if nv > vc and len(word) >= len(affix) + 3 and word.endswith(affix):
            stem = word[: -len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palat else stem
    return word


class LatvianAnalyzer(_SnowballAnalyzer):
    """Analysis/Lv/LatvianAnalyzer.cs analogue (stop + Latvian light
    stemmer)."""

    _stem = staticmethod(latvian_stem)

    def __init__(self, stopwords=LATVIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


# ===========================================================================
# Sorani Kurdish
# ===========================================================================

SORANI_STOP_WORDS = frozenset(
    "و لە بە بۆ کە ئەم ئەو ئەگەر بەڵام یان هەر هەموو هیچ چی کێ لەگەڵ "
    "دوای پێش ناو سەر ژێر بەر دە نە".split()
)

_CKB_HARAKAT = frozenset("ـًٌٍَُِّْ")


def sorani_normalize(word: str) -> str:
    """SoraniNormalizer.cs:53-113: yeh variants -> farsi yeh, kaf ->
    keheh, heh-ZWNJ and final/teh-marbuta heh -> ae, heh doachashmee ->
    heh, initial reh -> rreh, drop tatweel/harakat + format chars."""
    import unicodedata

    # faithful in-place simulation: the final-heh check compares against
    # the CURRENT buffer length mid-scan, so a heh followed by a later-
    # deleted diacritic is NOT final at visit time (matches the C# loop)
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("ي", "ى"):
            s[i] = "ی"
        elif c == "ك":
            s[i] = "ک"
        elif c == "‌":
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"
            del s[i]
            continue
        elif c == "ه":
            if i == len(s) - 1:
                s[i] = "ە"
        elif c == "ة":
            s[i] = "ە"
        elif c == "ھ":
            s[i] = "ه"
        elif c == "ر":
            if i == 0:
                s[i] = "ڕ"
        elif c == "ڒ":
            s[i] = "ڕ"
        elif c in _CKB_HARAKAT or unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(word: str) -> str:
    """SoraniStemmer.cs:29-131: postposition (-دا / -نا one char / -ەوە),
    possessive (-مان/-یان/-تان), then the indefinite/definite/plural
    chain, longest form first per group."""
    n = len(word)
    if n > 5 and word.endswith("دا"):
        word = word[:-2]
    elif n > 4 and word.endswith("نا"):
        word = word[:-1]
    elif n > 6 and word.endswith("ەوە"):
        word = word[:-3]
    n = len(word)
    if n > 6 and (word.endswith("مان") or word.endswith("یان")
                  or word.endswith("تان")):
        word = word[:-3]
    n = len(word)
    if n > 6 and word.endswith("ێکی"):
        return word[:-3]
    if n > 7 and word.endswith("یەکی"):
        return word[:-4]
    if n > 5 and word.endswith("ێک"):
        return word[:-2]
    if n > 6 and word.endswith("یەک"):
        return word[:-3]
    if n > 6 and word.endswith("ەکە"):
        return word[:-3]
    if n > 5 and word.endswith("کە"):
        return word[:-2]
    if n > 7 and word.endswith("ەکان"):
        return word[:-4]
    if n > 6 and word.endswith("کان"):
        return word[:-3]
    if n > 7 and word.endswith("یانی"):
        return word[:-4]
    if n > 6 and word.endswith("انی"):
        return word[:-3]
    if n > 6 and word.endswith("یان"):
        return word[:-3]
    if n > 5 and word.endswith("ان"):
        return word[:-2]
    if n > 7 and word.endswith("یانە"):
        return word[:-4]
    if n > 6 and word.endswith("انە"):
        return word[:-3]
    if n > 5 and (word.endswith("ایە") or word.endswith("ەیە")):
        return word[:-2]
    if n > 4 and word.endswith("ە"):
        return word[:-1]
    if n > 4 and word.endswith("ی"):
        return word[:-1]
    return word


class SoraniAnalyzer(_SnowballAnalyzer):
    """Analysis/Ckb/SoraniAnalyzer.cs analogue (stop -> normalize ->
    light stem)."""

    _stem = staticmethod(lambda t: sorani_stem(sorani_normalize(t)))

    def __init__(self, stopwords=SORANI_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
