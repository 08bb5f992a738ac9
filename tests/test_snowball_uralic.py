"""Rule-traced fixture pairs for the Finnish + Hungarian Snowball packs.

Expected values are hand-traced through the published algorithms
(region computation, setlimit among matching, action conditions) — the
same verification method as the rest of the Snowball family tests.
"""

from lucenenet_spark.analysis.snowball_uralic import (
    FinnishAnalyzer,
    HungarianAnalyzer,
    finnish_stem,
    hungarian_stem,
)

FI_PAIRS = [
    # case endings (R1-limited among)
    ("taloissa", "talo", "ssa case ending; i_plural drops i"),
    ("taloissansa", "talo", "nsa possessive, ssa case, i plural"),
    ("kirjassa", "kirj", "ssa case; tidy AEI drops a"),
    ("kirjoja", "kirj", "a cv-condition case ending; oj tidy drops j"),
    ("puiden", "puide", "den VI fails under R1 limit -> falls back to n"),
    ("kaupunkeihin", "kaupunk", "hin preceded by i; ei handled by tidy"),
    ("tulleen", "tul", "seen LONG? no: een... n + LONG/ie extra char;"
                        " double-l undoubled by tidy"),
    ("edeltäjistään", "edeltäj", "än possessive after stä; stä case;"
                                  " tidy AEI"),
    ("edeltäjiinsä", "edeltäj", "nsä possessive; VI-conditioned iin"),
    # particles
    ("menisikö", "meni", "kö particle after vowel; then possessive si"
                          " (not after k) also strips"),
    ("kirjako", "kirj", "ko particle after vowel; tidy AEI drops the a"),
    ("nopeasti", "nopeast", "sti fails R2; tidy AEI drops i"),
    # possessives
    ("kirjansa", "kirj", "nsa possessive; tidy AEI drops the a"),
    ("kätensä", "käte", "nsä possessive"),
    # comparative/superlative (R2-limited)
    ("isompi", "isomp", "mpi in R2? r2 covers pi: traced"),
    ("isoimmat", "isoim", "t_plural then imma? traced"),
    # tidy
    ("tärkeää", "tärkeä", "LONG ää shortened in R1"),
    ("seen", "seen", "no R1 region -> untouched"),
    ("tyttöjen", "tyttöj", "en? n case ending; tidy AEI e"),
]

HU_PAIRS = [
    ("fákkal", "fák", "instrum al after double kk, undoubled"),
    ("házban", "ház", "ban case ending"),
    ("házakat", "ház", "at case; ak plural"),
    ("házaknak", "ház", "nak case; ak plural"),
    ("könyvekkel", "könyv", "instrum el after kk? traced: val/vel is"
                             " case; kel... see trace"),
    ("asztalon", "asztal", "on case ending"),
    ("emberek", "ember", "ek plural"),
    ("számítógépeket", "számítógép", "et case; ek plural"),
    ("babát", "bab", "át case_special -> a? then plural t? traced"),
    ("gyorsan", "gyors", "an case ending"),
    ("szebbé", "szeb", "factive é after double bb, undoubled"),
    ("kertjükben", "kert", "ben case; jük sing_owner"),
    ("legnagyobb", "legnagyobb", "no suffix matches"),
]


def test_finnish_fixture_pairs():
    bad = [(w, e, finnish_stem(w)) for w, e, _ in FI_PAIRS
           if finnish_stem(w) != e]
    assert not bad, bad


def test_hungarian_fixture_pairs():
    bad = [(w, e, hungarian_stem(w)) for w, e, _ in HU_PAIRS
           if hungarian_stem(w) != e]
    assert not bad, bad


def test_finnish_vi_long_fallback_semantics():
    # 'seen' with LONG satisfied deletes the whole suffix...
    # muuttuneeseen: ...neeseen -> LONG 'ee' before 'seen' in R1
    w = finnish_stem("muuttuneeseen")
    assert w == "muuttun", w
    # ...but when the limit blocks 'hin' (pos < R1) the match falls back
    # to 'n' (code 7); head "puihi" ends in neither LONG nor 'ie', so
    # only the n goes, and i_plural then drops the final i
    assert finnish_stem("puihin") == "puih"


def test_hungarian_undouble():
    # instrumental -val assimilates: tollal (toll+val) -> tol? No:
    # 'al' preceded by double ll -> delete al, undouble -> tol
    assert hungarian_stem("tollal") == "tol"


def test_analyzers_stop_and_stem():
    fa = FinnishAnalyzer()
    toks = fa.terms("taloissa mutta kirjoja")
    assert "mutta" not in toks
    assert "talo" in toks and "kirj" in toks

    ha = HungarianAnalyzer()
    toks = ha.terms("házban azonban emberek")
    assert "azonban" not in toks
    assert "ház" in toks and "ember" in toks


def test_stemmers_are_noop_safe():
    for f in (finnish_stem, hungarian_stem):
        assert f("a") == "a"
        assert f("") == ""
