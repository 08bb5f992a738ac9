"""Greek analysis: GreekLowerCaseFilter + GreekStemmer + GreekAnalyzer
(`Analysis/El/GreekLowerCaseFilter.cs:79-134`, `GreekStemmer.cs:26-1018`
— the published Ntais/Saroukos Greek stemmer as shipped by the
reference).

The stemmer is a 23-rule cascade over accent-folded, final-sigma-
normalized lowercase text. NOTE: several reference rules read
`len > K && ends(A) || ends(B) || ...` where the length guard binds ONLY
to the first alternative (C# operator precedence); this transcription
preserves that behavior exactly — bug-compatible parity beats
prettiness here, and the fixtures in tests/test_greek.py pin it.

Like the other packs, stemming runs on the batch's unique-term
dictionary (O(|vocab|) Python per Arrow batch), keeping inversion
vectorized.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer

# --------------------------------------------------- GreekLowerCaseFilter
_EL_FOLD = {
    "ς": "σ",
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "ό": "ο", "ύ": "υ", "ϋ": "υ", "ΰ": "υ", "ώ": "ω",
}


def greek_lowercase(word: str) -> str:
    """Lowercase + tonos/dialytika removal + final sigma -> sigma."""
    return "".join(_EL_FOLD.get(c, c) for c in word.lower())


# --------------------------------------------------------- GreekStemmer
_EL_VOWELS = frozenset("αεηιουω")
_EL_VOWELS_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"])
_EXC15A = frozenset([
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ", "αμαλλι",
    "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
    "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
    "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ",
    "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ",
    "π", "τρ", "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])
_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])

GREEK_STOP_WORDS = frozenset(
    "και του της το τα των την τον τησ τουσ τισ οι ο η με σε για απο δεν "
    "θα που ειναι να μια ενα στο στη στην στον αλλα ωσ οπωσ ομωσ αυτο "
    "αυτη αυτοσ κατι κατα πολυ προσ ειτε εαν αν οτι τι ποια ποιο".split()
)


def greek_stem(word: str) -> str:  # noqa: C901 — rule cascade by design
    """GreekStemmer.cs Stem(): rules 0-20, rule 21 only when nothing
    fired, rule 22 always. Operates on the fold output of
    greek_lowercase."""
    s = list(word)
    n = len(s)
    if n < 4:
        return word

    def ew(ln: int, suf: str) -> bool:
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    def stem_is(ln: int, exc: frozenset) -> bool:
        return "".join(s[:ln]) in exc

    def vowel(ln: int) -> bool:
        return ln > 0 and s[ln - 1] in _EL_VOWELS

    def vowel_no_y(ln: int) -> bool:
        return ln > 0 and s[ln - 1] in _EL_VOWELS_NO_Y

    orig = n

    # rule 0
    if n > 9 and (ew(n, "καθεστωτοσ") or ew(n, "καθεστωτων")):
        n -= 4
    elif n > 8 and (ew(n, "γεγονοτοσ") or ew(n, "γεγονοτων")):
        n -= 4
    elif n > 8 and ew(n, "καθεστωτα"):
        n -= 3
    elif n > 7 and (ew(n, "τατογιου") or ew(n, "τατογιων")):
        n -= 4
    elif n > 7 and ew(n, "γεγονοτα"):
        n -= 3
    elif n > 7 and ew(n, "καθεστωσ"):
        n -= 2
    # reference precedence quirk: the len>6 guard binds only to σκαγιου
    elif (n > 6 and ew(n, "σκαγιου")) or ew(n, "σκαγιων") or \
            ew(n, "ολογιου") or ew(n, "ολογιων") or ew(n, "κρεατοσ") or \
            ew(n, "κρεατων") or ew(n, "περατοσ") or ew(n, "περατων") or \
            ew(n, "τερατοσ") or ew(n, "τερατων"):
        n -= 4
    elif n > 6 and ew(n, "τατογια"):
        n -= 3
    elif n > 6 and ew(n, "γεγονοσ"):
        n -= 2
    elif n > 5 and (ew(n, "φαγιου") or ew(n, "φαγιων") or
                    ew(n, "σογιου") or ew(n, "σογιων")):
        n -= 4
    elif n > 5 and (ew(n, "σκαγια") or ew(n, "ολογια") or ew(n, "κρεατα")
                    or ew(n, "περατα") or ew(n, "τερατα")):
        n -= 3
    elif n > 4 and (ew(n, "φαγια") or ew(n, "σογια") or ew(n, "φωτοσ")
                    or ew(n, "φωτων")):
        n -= 3
    elif n > 4 and (ew(n, "κρεασ") or ew(n, "περασ") or ew(n, "τερασ")):
        n -= 2
    elif n > 3 and ew(n, "φωτα"):
        n -= 2
    elif n > 2 and ew(n, "φωσ"):
        n -= 1

    # rule 1
    if n > 4 and (ew(n, "αδεσ") or ew(n, "αδων")):
        n -= 4
        if not (ew(n, "οκ") or ew(n, "μαμ") or ew(n, "μαν") or
                ew(n, "μπαμπ") or ew(n, "πατερ") or ew(n, "γιαγι") or
                ew(n, "νταντ") or ew(n, "κυρ") or ew(n, "θει") or
                ew(n, "πεθερ")):
            n += 2  # add back -αδ

    # rule 2
    if n > 4 and (ew(n, "εδεσ") or ew(n, "εδων")):
        n -= 4
        if ew(n, "οπ") or ew(n, "ιπ") or ew(n, "εμπ") or ew(n, "υπ") or \
                ew(n, "γηπ") or ew(n, "δαπ") or ew(n, "κρασπ") or ew(n, "μιλ"):
            n += 2  # add back -εδ

    # rule 3
    if n > 5 and (ew(n, "ουδεσ") or ew(n, "ουδων")):
        n -= 5
        if ew(n, "αρκ") or ew(n, "καλιακ") or ew(n, "πεταλ") or \
                ew(n, "λιχ") or ew(n, "πλεξ") or ew(n, "σκ") or ew(n, "σ") or \
                ew(n, "φλ") or ew(n, "φρ") or ew(n, "βελ") or ew(n, "λουλ") or \
                ew(n, "χν") or ew(n, "σπ") or ew(n, "τραγ") or ew(n, "φε"):
            n += 3  # add back -ουδ

    # rule 4
    if n > 3 and (ew(n, "εωσ") or ew(n, "εων")):
        n -= 3
        if stem_is(n, _EXC4):
            n += 1  # add back -ε

    # rule 5
    if n > 2 and ew(n, "ια"):
        n -= 2
        if vowel(n):
            n += 1  # add back -ι
    elif n > 3 and (ew(n, "ιου") or ew(n, "ιων")):
        n -= 3
        if vowel(n):
            n += 1

    # rule 6
    removed = False
    if n > 3 and (ew(n, "ικα") or ew(n, "ικο")):
        n -= 3
        removed = True
    elif n > 4 and (ew(n, "ικου") or ew(n, "ικων")):
        n -= 4
        removed = True
    if removed and (vowel(n) or stem_is(n, _EXC6)):
        n += 2  # add back -ικ

    # rule 7
    if n == 5 and ew(n, "αγαμε"):
        n -= 1
    else:
        if n > 7 and ew(n, "ηθηκαμε"):
            n -= 7
        elif n > 6 and ew(n, "ουσαμε"):
            n -= 6
        elif n > 5 and (ew(n, "αγαμε") or ew(n, "ησαμε") or ew(n, "ηκαμε")):
            n -= 5
        if n > 3 and ew(n, "αμε"):
            n -= 3
            if stem_is(n, _EXC7):
                n += 2  # add back -αμ

    # rule 8 (reference precedence quirks preserved on every tier)
    removed = False
    if n > 8 and ew(n, "ιουντανε"):
        n -= 8
        removed = True
    elif (n > 7 and ew(n, "ιοντανε")) or ew(n, "ουντανε") or ew(n, "ηθηκανε"):
        n -= 7
        removed = True
    elif (n > 6 and ew(n, "ιοτανε")) or ew(n, "οντανε") or ew(n, "ουσανε"):
        n -= 6
        removed = True
    elif (n > 5 and ew(n, "αγανε")) or ew(n, "ησανε") or ew(n, "οτανε") or \
            ew(n, "ηκανε"):
        n -= 5
        removed = True
    if removed and stem_is(n, _EXC8A):
        n += 4
        s[n - 4], s[n - 3], s[n - 2], s[n - 1] = "α", "γ", "α", "ν"
    if n > 3 and ew(n, "ανε"):
        n -= 3
        if vowel_no_y(n) or stem_is(n, _EXC8B):
            n += 2  # add back -αν

    # rule 9
    if n > 5 and ew(n, "ησετε"):
        n -= 5
    if n > 3 and ew(n, "ετε"):
        n -= 3
        if stem_is(n, _EXC9) or vowel_no_y(n) or ew(n, "οδ") or \
                ew(n, "αιρ") or ew(n, "φορ") or ew(n, "ταθ") or \
                ew(n, "διαθ") or ew(n, "σχ") or ew(n, "ενδ") or \
                ew(n, "ευρ") or ew(n, "τιθ") or ew(n, "υπερθ") or \
                ew(n, "ραθ") or ew(n, "ενθ") or ew(n, "ροθ") or \
                ew(n, "σθ") or ew(n, "πυρ") or ew(n, "αιν") or \
                ew(n, "συνδ") or ew(n, "συν") or ew(n, "συνθ") or \
                ew(n, "χωρ") or ew(n, "πον") or ew(n, "βρ") or \
                ew(n, "καθ") or ew(n, "ευθ") or ew(n, "εκθ") or \
                ew(n, "νετ") or ew(n, "ρον") or ew(n, "αρκ") or \
                ew(n, "βαρ") or ew(n, "βολ") or ew(n, "ωφελ"):
            n += 2  # add back -ετ

    # rule 10
    if n > 5 and (ew(n, "οντασ") or ew(n, "ωντασ")):
        n -= 5
        if n == 3 and ew(n, "αρχ"):
            n += 3  # add back *ντ
            s[n - 3] = "ο"
        if ew(n, "κρε"):
            n += 3
            s[n - 3] = "ω"

    # rule 11
    if n > 6 and ew(n, "ομαστε"):
        n -= 6
        if n == 2 and ew(n, "ον"):
            n += 5  # add back -ομαστ
    elif n > 7 and ew(n, "ιομαστε"):
        n -= 7
        if n == 2 and ew(n, "ον"):
            n += 5
            s[n - 5], s[n - 4], s[n - 3], s[n - 2], s[n - 1] = \
                "ο", "μ", "α", "σ", "τ"

    # rule 12
    if n > 5 and ew(n, "ιεστε"):
        n -= 5
        if stem_is(n, _EXC12A):
            n += 4  # add back -ιεστ
    if n > 4 and ew(n, "εστε"):
        n -= 4
        if stem_is(n, _EXC12B):
            n += 3  # add back -εστ

    # rule 13
    if n > 6 and ew(n, "ηθηκεσ"):
        n -= 6
    elif n > 5 and (ew(n, "ηθηκα") or ew(n, "ηθηκε")):
        n -= 5
    removed = False
    if n > 4 and ew(n, "ηκεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ηκα") or ew(n, "ηκε")):
        n -= 3
        removed = True
    if removed and (stem_is(n, _EXC13) or ew(n, "σκωλ") or
                    ew(n, "σκουλ") or ew(n, "ναρθ") or ew(n, "σφ") or
                    ew(n, "οθ") or ew(n, "πιθ")):
        n += 2  # add back -ηκ

    # rule 14
    removed = False
    if n > 5 and ew(n, "ουσεσ"):
        n -= 5
        removed = True
    elif n > 4 and (ew(n, "ουσα") or ew(n, "ουσε")):
        n -= 4
        removed = True
    if removed and (stem_is(n, _EXC14) or vowel(n) or ew(n, "ποδαρ") or
                    ew(n, "βλεπ") or ew(n, "πανταχ") or ew(n, "φρυδ") or
                    ew(n, "μαντιλ") or ew(n, "μαλλ") or ew(n, "κυματ") or
                    ew(n, "λαχ") or ew(n, "ληγ") or ew(n, "φαγ") or
                    ew(n, "ομ") or ew(n, "πρωτ")):
        n += 3  # add back -ουσ

    # rule 15
    removed = False
    if n > 4 and ew(n, "αγεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "αγα") or ew(n, "αγε")):
        n -= 3
        removed = True
    if removed:
        cond1 = stem_is(n, _EXC15A) or ew(n, "οφ") or ew(n, "πελ") or \
            ew(n, "χορτ") or ew(n, "λλ") or ew(n, "σφ") or ew(n, "ρπ") or \
            ew(n, "φρ") or ew(n, "πρ") or ew(n, "λοχ") or ew(n, "σμην")
        cond2 = stem_is(n, _EXC15B) or ew(n, "κολλ")
        if cond1 and not cond2:
            n += 2  # add back -αγ

    # rule 16
    removed = False
    if n > 4 and ew(n, "ησου"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ησε") or ew(n, "ησα")):
        n -= 3
        removed = True
    if removed and stem_is(n, _EXC16):
        n += 2  # add back -ησ

    # rule 17
    if n > 4 and ew(n, "ηστε"):
        n -= 4
        if stem_is(n, _EXC17):
            n += 3  # add back -ηστ

    # rule 18
    removed = False
    if n > 6 and (ew(n, "ησουνε") or ew(n, "ηθουνε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουνε"):
        n -= 4
        removed = True
    if removed and stem_is(n, _EXC18):
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "ν"

    # rule 19
    removed = False
    if n > 6 and (ew(n, "ησουμε") or ew(n, "ηθουμε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουμε"):
        n -= 4
        removed = True
    if removed and stem_is(n, _EXC19):
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "μ"

    # rule 20
    if n > 5 and (ew(n, "ματων") or ew(n, "ματοσ")):
        n -= 3
    elif n > 4 and ew(n, "ματα"):
        n -= 2

    # rule 21 (only if nothing fired)
    if n == orig:
        if n > 9 and ew(n, "ιοντουσαν"):
            n -= 9
        elif n > 8 and (ew(n, "ιομασταν") or ew(n, "ιοσασταν") or
                        ew(n, "ιουμαστε") or ew(n, "οντουσαν")):
            n -= 8
        elif n > 7 and (ew(n, "ιεμαστε") or ew(n, "ιεσαστε") or
                        ew(n, "ιομουνα") or ew(n, "ιοσαστε") or
                        ew(n, "ιοσουνα") or ew(n, "ιουνται") or
                        ew(n, "ιουνταν") or ew(n, "ηθηκατε") or
                        ew(n, "ομασταν") or ew(n, "οσασταν") or
                        ew(n, "ουμαστε")):
            n -= 7
        elif n > 6 and (ew(n, "ιομουν") or ew(n, "ιονταν") or
                        ew(n, "ιοσουν") or ew(n, "ηθειτε") or
                        ew(n, "ηθηκαν") or ew(n, "ομουνα") or
                        ew(n, "οσαστε") or ew(n, "οσουνα") or
                        ew(n, "ουνται") or ew(n, "ουνταν") or
                        ew(n, "ουσατε")):
            n -= 6
        elif n > 5 and (ew(n, "αγατε") or ew(n, "ιεμαι") or
                        ew(n, "ιεται") or ew(n, "ιεσαι") or
                        ew(n, "ιοταν") or ew(n, "ιουμα") or
                        ew(n, "ηθεισ") or ew(n, "ηθουν") or
                        ew(n, "ηκατε") or ew(n, "ησατε") or
                        ew(n, "ησουν") or ew(n, "ομουν") or
                        ew(n, "ονται") or ew(n, "ονταν") or
                        ew(n, "οσουν") or ew(n, "ουμαι") or
                        ew(n, "ουσαν")):
            n -= 5
        elif n > 4 and (ew(n, "αγαν") or ew(n, "αμαι") or ew(n, "ασαι") or
                        ew(n, "αται") or ew(n, "ειτε") or ew(n, "εσαι") or
                        ew(n, "εται") or ew(n, "ηδεσ") or ew(n, "ηδων") or
                        ew(n, "ηθει") or ew(n, "ηκαν") or ew(n, "ησαν") or
                        ew(n, "ησει") or ew(n, "ησεσ") or ew(n, "ομαι") or
                        ew(n, "οταν")):
            n -= 4
        elif n > 3 and (ew(n, "αει") or ew(n, "εισ") or ew(n, "ηθω") or
                        ew(n, "ησω") or ew(n, "ουν") or ew(n, "ουσ")):
            n -= 3
        elif n > 2 and (ew(n, "αν") or ew(n, "ασ") or ew(n, "αω") or
                        ew(n, "ει") or ew(n, "εσ") or ew(n, "ησ") or
                        ew(n, "οι") or ew(n, "οσ") or ew(n, "ου") or
                        ew(n, "υσ") or ew(n, "ων")):
            n -= 2
        elif n > 1 and vowel(n):
            n -= 1

    # rule 22 (always)
    if ew(n, "εστερ") or ew(n, "εστατ"):
        n -= 5
    elif ew(n, "οτερ") or ew(n, "οτατ") or ew(n, "υτερ") or \
            ew(n, "υτατ") or ew(n, "ωτερ") or ew(n, "ωτατ"):
        n -= 4

    return "".join(s[:n])


class GreekAnalyzer(_SnowballAnalyzer):
    """Analysis/El/GreekAnalyzer.cs analogue: GreekLowerCaseFilter fold
    + stop + GreekStemmer, with the fold+stem applied at the unique-term
    dictionary. Stop set is a curated accentless subset (checked on the
    pre-fold surface token — keep entries accentless+final-sigma-free to
    match post-tokenize lowercase text)."""

    _stem = staticmethod(lambda t: greek_stem(greek_lowercase(t)))

    def __init__(self, stopwords=GREEK_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
