"""Hunspell engine tests — dictionaries and expectations mirror the
reference's test resources (Lucene.Net.Tests.Analysis.Common/Analysis/
Hunspell: simple.aff/dic, condition semantics, twofold suffixes,
homonyms, flag modes, fullstrip, needaffix, keepcase)."""

from lucenenet_spark.analysis.hunspell import (
    HunspellDictionary,
    HunspellStemmer,
)

SIMPLE_AFF = """SET UTF-8
TRY abcdefghijklmopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ

SFX A Y 3
SFX A   0     e         n
SFX A   0     e         t
SFX A   0     e         h

SFX C Y 2
SFX C   0     d/C       c
SFX C   0     c         b

SFX D Y 1
SFX D   0     s         o

SFX E Y 1
SFX E   0     d         o

PFX B Y 1
PFX B   0     s         o
"""

SIMPLE_DIC = """9
ab/C
apach/A
foo/D
foo/E
lucen/A
lucene
mahout/A
moo/E
olr/B
"""


def _stemmer(aff=SIMPLE_AFF, dic=SIMPLE_DIC, **kw):
    return HunspellStemmer(HunspellDictionary(aff, dic, **kw))


def test_simple_suffix():
    s = _stemmer()
    # StemmerTestBase-style expectations over simple.aff/dic
    assert s.unique_stems("lucene") == ["lucene", "lucen"]
    assert s.unique_stems("mahoute") == ["mahout"]
    assert s.unique_stems("apache") == ["apach"]
    # no match
    assert s.unique_stems("nothing") == []


def test_simple_prefix():
    s = _stemmer()
    # olr/B + prefix 's' -> 'solr' stems to olr
    assert s.unique_stems("solr") == ["olr"]


def test_recursive_suffix_needs_continuation():
    s = _stemmer()
    assert s.unique_stems("abc") == ["ab"]
    # TestStemmer.cs TestRecursiveSuffix: "we should not recurse here,
    # as the suffix has no continuation!" — abcd strips d (C1), but the
    # inner c-rule's append carries no continuation classes, so the
    # chain is not licensed
    assert s.unique_stems("abcd") == []


def test_all_stems_reference_table():
    # TestStemmer.cs TestAllStems, as exact multisets
    s = _stemmer()
    expectations = {
        "ab": ["ab"], "abc": ["ab"], "apach": ["apach"],
        "apache": ["apach"], "foo": ["foo", "foo"], "food": ["foo"],
        "foos": ["foo"], "lucen": ["lucen"],
        "lucene": ["lucene", "lucen"], "mahout": ["mahout"],
        "mahoute": ["mahout"], "moo": ["moo"], "mood": ["moo"],
        "olr": ["olr"], "solr": ["olr"],
    }
    for w, exp in expectations.items():
        assert sorted(s.stem(w)) == sorted(exp), (w, s.stem(w), exp)
    for bogus in ("abs", "abe", "sab", "sapach", "abcd", "moos"):
        assert s.stem(bogus) == [], (bogus, s.stem(bogus))


def test_homonyms_merge_flags_per_entry():
    s = _stemmer()
    # foo/D and foo/E are separate entries; both 'foos' (D after o) and
    # 'food' (E after o) resolve
    assert s.unique_stems("foos") == ["foo"]
    assert s.unique_stems("food") == ["foo"]
    # moo/E only: moos must NOT stem (D not on moo)
    assert s.unique_stems("moos") == []
    assert s.unique_stems("mood") == ["moo"]


def test_condition_character_class():
    aff = """SET UTF-8
SFX A Y 2
SFX A   0     s       [^y]
SFX A   y     ies     [^aeiou]y
"""
    dic = "2\ndog/A\nparty/A\n"
    s = _stemmer(aff, dic)
    assert s.unique_stems("dogs") == ["dog"]
    assert s.unique_stems("parties") == ["party"]
    # condition [^y] blocks 'partys' -> 'party'? 'party' ends in y, so
    # the bare-s rule's restored stem 'party' fails [^y]
    assert s.unique_stems("partys") == []


def test_fullstrip_allows_whole_word_affix():
    aff = "SET UTF-8\nFULLSTRIP\nSFX A Y 1\nSFX A 0 ed .\n"
    dic = "1\n/A\n"  # empty stem entry is unusual; use a real one below
    aff2 = "SET UTF-8\nSFX A Y 1\nSFX A 0 ed .\n"
    s2 = _stemmer(aff2, "1\nwork/A\n")
    assert s2.unique_stems("worked") == ["work"]
    # without FULLSTRIP a suffix may not consume the entire word
    assert s2.unique_stems("ed") == []


def test_needaffix_blocks_bare_word():
    aff = "SET UTF-8\nNEEDAFFIX X\nSFX A Y 1\nSFX A 0 s .\n"
    dic = "1\npseudo/AX\n"
    s = _stemmer(aff, dic)
    assert s.unique_stems("pseudo") == []       # bare form not a word
    assert s.unique_stems("pseudos") == ["pseudo"]


def test_keepcase_filters_case_variants():
    aff = "SET UTF-8\nKEEPCASE K\n"
    dic = "2\nUNESCO/K\nparis\n"
    s = _stemmer(aff, dic)
    assert s.unique_stems("UNESCO") == ["UNESCO"]  # exact case ok
    assert s.unique_stems("Paris") == ["paris"]    # title -> lower union
    assert s.unique_stems("Unesco") == []          # keepcase kills variant


def test_flag_long_and_num_modes():
    aff = "SET UTF-8\nFLAG long\nSFX Aa Y 1\nSFX Aa 0 s .\n"
    s = _stemmer(aff, "1\nbook/Aa\n")
    assert s.unique_stems("books") == ["book"]

    aff_n = "SET UTF-8\nFLAG num\nSFX 65 Y 1\nSFX 65 0 s .\n"
    s_n = _stemmer(aff_n, "1\npen/65\n")
    assert s_n.unique_stems("pens") == ["pen"]


def test_cross_product_prefix_plus_suffix():
    aff = """SET UTF-8
PFX P Y 1
PFX P 0 un .
SFX S Y 1
SFX S 0 ed .
"""
    dic = "1\nlock/PS\n"
    s = _stemmer(aff, dic)
    assert s.unique_stems("unlock") == ["lock"]
    assert s.unique_stems("locked") == ["lock"]
    # cross product: both affixes (prefix rule cross=Y recurses into
    # the suffix pass with the prefix flag cross-checked on the entry)
    assert s.unique_stems("unlocked") == ["lock"]
