"""PathHierarchyTokenizer: growing path-prefix tokens.

Reimplements Analysis/Path/PathHierarchyTokenizer.cs semantics (pinned
against TestPathHierarchyTokenizer.cs): '/a/b/c' emits '/a', '/a/b',
'/a/b/c'; a trailing delimiter emits the delimiter-terminated path too;
consecutive delimiters each bound a token; `replacement` substitutes
the delimiter in the OUTPUT; `skip` drops the first N components and
emitted tokens then begin with the delimiter ('a/b/c', skip=1 ->
'/b', '/b/c'). All tokens share position 0 (posIncr 1,0,0,... in the
reference), so the norm length of a path field is 1.

Typical use: drill-down facet paths — index the prefixes, filter with
a TermQuery on any ancestor path (the taxonomy-facet pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer


def path_hierarchy_tokens(
    path: str, delimiter: str = "/", replacement: str | None = None,
    skip: int = 0,
) -> list[str]:
    """Token list for one path (see module docstring for semantics)."""
    repl = delimiter if replacement is None else replacement
    if not path:
        return []
    delims = [i for i, ch in enumerate(path) if ch == delimiter]
    if skip > 0:
        # skip N components: start at the (skip)-th delimiter, one later
        # when the path begins with a delimiter (its first component
        # starts after it)
        nth = skip + 1 if delims and delims[0] == 0 else skip
        if len(delims) < nth:
            return []
        start = delims[nth - 1]
    else:
        start = 0
    bounds = [i for i in delims if i > start]
    pieces = [path[start:i] for i in bounds] + [path[start:]]
    return [p.replace(delimiter, repl) for p in pieces if p]


class PathHierarchyAnalyzer(StandardAnalyzer):
    """Analyzer facade: each input value is ONE path; emits its prefix
    tokens, all at position 0, norm length 1."""

    def __init__(self, delimiter: str = "/", replacement: str | None = None,
                 skip: int = 0, **kw):
        super().__init__(stopwords=None, lowercase=False, **kw)
        self.delimiter = delimiter
        self.replacement = replacement
        self.skip = skip

    def tokenize_batch(self, texts: pd.Series):
        n_rows = len(texts)
        out_r: list[int] = []
        out_t: list[str] = []
        lens = np.zeros(n_rows, dtype=np.int32)
        for r, v in enumerate(texts.fillna("").astype(str)):
            toks = path_hierarchy_tokens(
                v, self.delimiter, self.replacement, self.skip
            )
            out_r.extend([r] * len(toks))
            out_t.extend(toks)
            lens[r] = 1 if toks else 0   # posIncr 1,0,0,... discountOverlaps
        return (
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_t, dtype=object),
            np.zeros(len(out_t), dtype=np.int32),   # all at position 0
            lens,
        )

    def tokenize_batch_arrow(self, texts):  # pragma: no cover - explicit
        raise NotImplementedError("path tokenization uses the pandas API")

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
