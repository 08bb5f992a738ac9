"""WikipediaTokenizer: wiki-markup-aware tokenization with TYPED tokens.

Reference: src/Lucene.Net.Analysis.Common/Analysis/Wikipedia/
WikipediaTokenizer.cs:39-49 — markup classes surface as token types
(INTERNAL_LINK "il", EXTERNAL_LINK "el" / EXTERNAL_LINK_URL "elu",
CITATION "ci", CATEGORY "c", BOLD "b", ITALICS "i", BOLD_ITALICS "bi",
HEADING "h", SUB_HEADING "sh"); plain text tokenizes as alphanumerics
with an empty type here (reference: "<ALPHANUM>").

Documented subset of the JFlex grammar (same scope discipline as the
UAX#29 subset in analyzers.py): one linear regex scan recognizes, in
reading order —

- ``[[Category:X]]``      -> the category target words, type "c"
- ``[[Target]]`` / ``[[Target|shown]]`` -> target words type "il",
  piped display words as plain alphanumerics
- ``[http://u words]``    -> the URL, type "elu"; trailing words "el"
- ``'''''x'''''``         -> words typed "bi"
- ``'''x'''``             -> "b";  ``''x''`` -> "i"
- ``=== x ===`` (3+)      -> "sh"; ``== x ==`` -> "h" (line-anchored)
- ``<ref ...>x</ref>``    -> words typed "ci"
- everything else         -> lowercased alphanumeric runs, type ""

Tokens are lowercased (LowerCaseFilter position in the reference's
WikipediaAnalyzer chain) and positions increment once per emitted token
in reading order — markup delimiters consume no positions. Flat-vocab
batch shape matches the other analyzers (token work is O(batch text),
Arrow-friendly, never per-posting Python on the hot inversion path).
"""

from __future__ import annotations

import re

import pandas as pd

_WORD = re.compile(r"[a-z0-9_']+")

_SCAN = re.compile(
    r"""
    \[\[\s*Category:(?P<cat>[^\]|]+)(?:\|[^\]]*)?\]\]
  | \[\[(?P<ilt>[^\]|]+)(?:\|(?P<ild>[^\]]*))?\]\]
  | \[(?P<elu>https?://\S+)(?:\s+(?P<elw>[^\]]*))?\]
  | '''''(?P<bi>.+?)'''''
  | '''(?P<b>.+?)'''
  | ''(?P<i>.+?)''
  | ^(?P<sheq>===+)\s*(?P<sh>.+?)\s*===+\s*$
  | ^==\s*(?P<h>.+?)\s*==\s*$
  | <ref[^>/]*>(?P<ci>.*?)</ref>
  | (?P<plain>[A-Za-z0-9_']+)
    """,
    re.VERBOSE | re.MULTILINE | re.DOTALL | re.IGNORECASE,
)

# group name -> emitted token type ("" = plain alphanumeric)
_TYPED = (
    ("cat", "c"),
    ("ilt", "il"),
    ("bi", "bi"),
    ("b", "b"),
    ("i", "i"),
    ("sh", "sh"),
    ("h", "h"),
    ("ci", "ci"),
    ("plain", ""),
)


def wiki_tokens(text: str) -> list[tuple[str, str, int]]:
    """(term, type, position) triples for one wiki-markup string."""
    out: list[tuple[str, str, int]] = []
    pos = 0
    for m in _SCAN.finditer(text or ""):
        for group, ttype in _TYPED:
            val = m.group(group)
            if val is None:
                continue
            for w in _WORD.findall(val.lower()):
                out.append((w, ttype, pos))
                pos += 1
            break
        # external links: URL token then display words
        if m.group("elu") is not None:
            out.append((m.group("elu").lower(), "elu", pos))
            pos += 1
            for w in _WORD.findall((m.group("elw") or "").lower()):
                out.append((w, "el", pos))
                pos += 1
        # piped display text of an internal link is plain alphanumerics
        if m.group("ild"):
            for w in _WORD.findall(m.group("ild").lower()):
                out.append((w, "", pos))
                pos += 1
    return out


def wiki_tokens_batch(texts: pd.Series) -> pd.Series:
    """Per-row list<struct<term,type,pos>> — the Arrow-batch entry point."""
    return pd.Series(
        [
            [{"term": t, "type": ty, "pos": p} for (t, ty, p) in wiki_tokens(x)]
            for x in texts
        ],
        index=texts.index,
    )


def wiki_typed_tokens(df, text_col: str = "text", id_col: str = "doc_id"):
    """(id, term, type, pos) rows from a wiki-markup column — Arrow-batched
    mapInPandas (no shuffle; one pass over the scan partitions)."""
    import pandas as _pd

    schema = f"{id_col} long, term string, type string, pos int"

    def emit(batches):
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                rows.extend((did, t, ty, p) for (t, ty, p) in wiki_tokens(txt))
            yield _pd.DataFrame(rows, columns=[id_col, "term", "type", "pos"])

    return df.select(id_col, text_col).mapInPandas(emit, schema=schema)
