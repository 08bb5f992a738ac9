"""Rule-traced fixture pairs for the Romanian + Catalan Snowball packs.

Each expected value is hand-traced through the published algorithm
(region computation, among longest-match, rule conditions) — the same
verification method as tests/test_snowball.py and test_snowball_more.py.
"""

from lucenenet_spark.analysis.snowball_romance2 import (
    CatalanAnalyzer,
    RomanianAnalyzer,
    catalan_stem,
    romanian_stem,
)

# (word, expected, rule trace note)
RO_PAIRS = [
    # step 0 (plural/article, R1)
    ("românul", "român", "ul: R1 delete"),
    ("apelor", "ape", "elor->e; vowel-suffix e blocked (pos<RV)"),
    ("copiilor", "cop", "iilor->i; vowel-suffix deletes i at RV edge"),
    ("lucrurile", "lucrur", "ile->i (not after ab); vowel i deleted"),
    ("abile", "abil", "ile blocked by ab condition; vowel e deleted"),
    ("aua", "aua", "aua->a requires R1; r1=len -> untouched"),
    ("atei", "ate", "atei->at fails R1 (pos<r1); vowel-suffix i in RV"),
    # step 1 combo (repeat, R1) + step 2 standard (R2)
    ("absurdităţilor", "absurd", "ilor->i; itaţi... ităţi R2 delete"),
    ("abilitatea", "abil", "ea->e; itate R2 delete"),
    ("ivitate", "ivitat", "combo/standard fail R1/R2; vowel e deleted"),
    ("icativitate", "icat", "combo ivitate->iv in R1, repeat iv.. then"
                            " standard iv R2 delete"),
    ("naţiunea", "naţiun", "ea->e; iune fails R2 (pos<r2); vowel e drops"),
    ("porţiuni", "porţiun", "iuni code 2 fails R2; vowel i drops"),
    ("convenţiuni", "convent", "iuni in R2, preceded by ţ -> ţiuni"
                               " becomes t"),
    ("socialism", "socialist", "ism code 3 -> ist in R2"),
    # step 3 verbs (RV-limited) — only when no standard suffix removed
    ("merge", "merg", "vowel-suffix e in RV"),
    ("mergeţi", "merg", "eţi code 2 unconditional delete in RV"),
    ("lucrează", "lucr", "ează code 1, preceded by consonant r"),
    ("cânta", "cânt", "vowel a in RV"),
    ("cântau", "cânt", "au code 1: t at pos 3 is within RV (rv=3),"
                        " consonant -> delete"),
    # prelude/postlude
    ("băiat", "băiat", "prelude marks nothing here; no suffix in regions"),
    ("femeia", "femei", "prelude femeIa; vowel a drops; postlude I->i"),
]

CA_PAIRS = [
    ("agradables", "agradab", "ables code 1 in R1"),
    ("barcelonines", "barcelon", "ines code 1 in R1"),
    ("acceleració", "acceler", "ació code 1 in R1"),
    ("cantaria", "cant", "verb aria code 1 in R1"),
    ("cantarien", "cant", "verb arien code 1 in R1"),
    ("bellesa", "bell", "esa code 1 in R1"),
    ("ecologia", "ecolog", "logia code 3 -> log (R2)"),
    ("ecològic", "ecologic", "ic code 4 -> ic (R2) + accent cleaning"),
    ("justícia", "just", "ícia code 1 in R1"),
    ("arqueològiques", "arqueologic", "iques code 4 -> ic + cleaning"),
    ("trencaments", "trenc", "aments code 1 in R1"),
    ("qualitats", "qual", "itats code 1 in R1"),
    ("personalment", "personal", "ment code 1 in R1"),
    ("passejades", "passej", "ades code 2 in R2 delete"),
    ("veïns", "vein", "residual + diaeresis cleaning"),
    ("taula", "taul", "residual a in R1"),
]


def test_romanian_fixture_pairs():
    bad = [(w, e, romanian_stem(w)) for w, e, _ in RO_PAIRS
           if romanian_stem(w) != e]
    assert not bad, bad


def test_catalan_fixture_pairs():
    bad = [(w, e, catalan_stem(w)) for w, e, _ in CA_PAIRS
           if catalan_stem(w) != e]
    assert not bad, bad


def test_romanian_verb_only_if_no_standard_removal():
    # standard suffix fires -> verb suffix must NOT also strip
    # abilitatea: step0 ea->e, standard itate deleted -> 'abil';
    # a verb pass would have found nothing anyway, but the flag path
    # must leave the word as the standard pass produced it.
    assert romanian_stem("abilitatea") == "abil"


def test_romanian_prelude_marks_intervocalic_iu():
    from lucenenet_spark.analysis.snowball_romance2 import _ro_prelude

    assert _ro_prelude("aiua") == "aIua"
    assert _ro_prelude("aiia") == "aIia"
    assert _ro_prelude("ai") == "ai"


def test_catalan_cleaning_folds_accents():
    assert catalan_stem("ecològic") == "ecologic"
    assert catalan_stem("cafè") == "cafe"


def test_analyzers_stop_and_stem():
    ra = RomanianAnalyzer()
    toks = ra.terms("lucrurile acestea merge")
    # 'acestea' is a stop word; others stem
    assert "acestea" not in toks
    assert "lucrur" in toks and "merg" in toks

    ca = CatalanAnalyzer()
    toks = ca.terms("aquelles propostes agradables")
    assert "aquelles" not in toks
    assert "agradab" in toks


def test_stemmers_are_noop_safe():
    for f in (romanian_stem, catalan_stem):
        assert f("a") == "a"
        assert f("") == ""
