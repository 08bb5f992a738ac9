"""Payload-emitting analysis: DelimitedPayloadTokenFilter analogue.

Reference: src/Lucene.Net.Analysis.Common/Analysis/Payloads/
DelimitedPayloadTokenFilter.cs (WhitespaceTokenizer + delimiter-split
payload encoding, the canonical Lucene payload indexing chain) and
src/Lucene.Net/Index/ — payloads are per-POSITION values stored beside
the position in the postings. Here the payload is a float32 column
`payloads: array<float>` parallel to `positions`, aggregated in the same
zero-shuffle inversion pass (builder.py picks it up via the
`emits_payloads` property)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import (
    DEFAULT_MAX_TOKEN_LENGTH,
    StandardAnalyzer,
)


class DelimitedPayloadAnalyzer(StandardAnalyzer):
    """Whitespace tokenize -> lowercase -> split `term|payload`.

    Tokens carrying the delimiter contribute float(payload); tokens
    without one get `default_payload` (FloatEncoder semantics —
    Analysis/Payloads/FloatEncoder.cs). No stop filter (the reference
    payload chains index every token). Malformed payloads fall back to
    the default rather than erroring (web text is hostile)."""

    emits_payloads = True

    def __init__(self, delimiter: str = "|", default_payload: float = 1.0,
                 lowercase: bool = True,
                 max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH) -> None:
        super().__init__(stopwords=None, lowercase=lowercase,
                         max_token_length=max_token_length)
        self.delimiter = delimiter
        self.default_payload = float(default_payload)

    def tokenize_batch(self, texts: pd.Series):
        texts = pd.Series(texts).fillna("").astype(str)
        n_rows = len(texts)
        tok_lists = texts.str.split()
        counts = tok_lists.str.len().fillna(0).to_numpy(dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return (
                np.array([], dtype=np.int64),
                np.array([], dtype=object),
                np.array([], dtype=np.int32),
                np.zeros(n_rows, dtype=np.int32),
                np.array([], dtype=np.float32),
            )
        from itertools import chain

        flat = np.fromiter(chain.from_iterable(tok_lists), dtype=object, count=total)
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        offsets = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        positions = (np.arange(total, dtype=np.int64) - offsets[row_idx]).astype(np.int32)

        s = pd.Series(flat)
        # rsplit once on the delimiter: term|3.5 -> (term, 3.5)
        parts = s.str.rsplit(self.delimiter, n=1)
        has_pl = parts.str.len() == 2
        terms = np.where(has_pl, parts.str[0], s).astype(object)
        payloads = np.full(total, self.default_payload, dtype=np.float32)
        pl_str = pd.Series(np.where(has_pl, parts.str[1], ""), dtype=object)
        pl_val = pd.to_numeric(pl_str, errors="coerce")
        ok = has_pl.to_numpy() & pl_val.notna().to_numpy()
        payloads[ok] = pl_val.to_numpy(dtype=np.float64, na_value=np.nan)[
            ok
        ].astype(np.float32)

        terms_s = pd.Series(terms)
        if self.lowercase:
            terms_s = terms_s.str.lower()
        keep = (terms_s.str.len() > 0).to_numpy() & (
            terms_s.str.len() <= self.max_token_length
        ).to_numpy()
        kept_rows = row_idx[keep]
        field_lens = np.bincount(kept_rows, minlength=n_rows).astype(np.int32)
        return (
            kept_rows,
            terms_s.to_numpy()[keep],
            positions[keep],
            field_lens,
            payloads[keep],
        )

    def tokenize_text(self, text: str):
        r, t, p, _, pl = self.tokenize_batch(pd.Series([text]))
        return list(zip(t.tolist(), p.tolist(), pl.tolist()))

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
