"""PathHierarchyTokenizer parity tests — every expectation below is a
row from the reference's TestPathHierarchyTokenizer.cs."""

import pandas as pd

from lucenenet_spark.analysis.path_hierarchy import (
    PathHierarchyAnalyzer,
    path_hierarchy_tokens,
)

CASES = [
    (("/a/b/c",), ["/a", "/a/b", "/a/b/c"]),
    (("/a/b/c/",), ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    (("a/b/c",), ["a", "a/b", "a/b/c"]),
    (("a/b/c/",), ["a", "a/b", "a/b/c", "a/b/c/"]),
    (("/",), ["/"]),
    (("//",), ["/", "//"]),
    (("/a/b/c", "/", "\\"), ["\\a", "\\a\\b", "\\a\\b\\c"]),
    (("c:\\a\\b\\c", "\\", "\\"), ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    # skip variants
    (("/a/b/c", "/", None, 1), ["/b", "/b/c"]),
    (("/a/b/c/", "/", None, 1), ["/b", "/b/c", "/b/c/"]),
    (("a/b/c", "/", None, 1), ["/b", "/b/c"]),
    (("a/b/c/", "/", None, 1), ["/b", "/b/c", "/b/c/"]),
    (("/", "/", None, 1), []),
    (("//", "/", None, 1), ["/"]),
]


def test_reference_expectations():
    bad = [(args, path_hierarchy_tokens(*args), exp)
           for args, exp in CASES if path_hierarchy_tokens(*args) != exp]
    assert not bad, bad


def test_analyzer_positions_and_norms():
    az = PathHierarchyAnalyzer()
    r, t, p, fl = az.tokenize_batch(pd.Series(["/a/b/c", "", "/x"]))
    assert list(t) == ["/a", "/a/b", "/a/b/c", "/x"]
    assert list(p) == [0, 0, 0, 0]          # posIncr 1,0,0,... -> one pos
    assert list(fl) == [1, 0, 1]            # discountOverlaps norm length
    assert list(r) == [0, 0, 0, 2]
