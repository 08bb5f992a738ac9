"""Deterministic synthetic webtext corpus generator (FIXTURES.md §1).

Numpy-vectorized so the 200k-doc bench corpus generates in seconds:
Zipf(s=1.1) draws over vocabulary w0000..w9999 mixed with the 33 English
stopwords, LogNormal doc lengths (mean ~120 tokens, sigma 0.6) capped
[5, 2000], casing/punctuation variants every 10th doc, url/warc_ts/html
columns per the BASELINE.json input_hint schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

_STOPS = np.array(sorted(ENGLISH_STOP_WORDS))


def generate_corpus(n_docs: int, seed: int = 42, vocab_size: int = 10_000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        np.exp(rng.normal(np.log(120.0), 0.6, size=n_docs)).astype(np.int64), 5, 2000
    )
    total = int(lengths.sum())

    # token stream: 25% stopwords, 75% Zipf-vocabulary words.
    # Zipf(s=1.1) over the finite vocab via inverse-CDF (vectorized;
    # numpy's rng.zipf rejection sampler is ~100x slower for s near 1).
    is_stop = rng.random(total) < 0.25
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    pmf = ranks ** -1.1
    cdf = np.cumsum(pmf / pmf.sum())
    vocab_ids = np.searchsorted(cdf, rng.random(total), side="left")
    stop_idx = rng.integers(0, len(_STOPS), size=total)
    vocab_words = np.array([f"w{i:04d}" for i in range(vocab_size)])
    words = np.where(is_stop, _STOPS[stop_idx], vocab_words[vocab_ids])
    stop_lens = np.char.str_len(_STOPS)
    word_lens = np.where(is_stop, stop_lens[stop_idx], 5).astype(np.int64)

    # one C-level join of the whole token stream, then slice per doc by
    # char offsets — ~30x faster than 200k per-doc joins
    big = " ".join(words.tolist())
    tok_ends = np.cumsum(word_lens + 1)  # position AFTER each token's trailing sep
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    char_lo = np.concatenate(([0], tok_ends[offsets[1:-1] - 1]))
    char_hi = tok_ends[offsets[1:] - 1] - 1
    texts = [big[int(lo) : int(hi)] for lo, hi in zip(char_lo, char_hi)]
    for d in range(0, n_docs, 10):
        texts[d] += " Quick FOX, jumps!"  # casing/punctuation exercise

    doc_ids = np.arange(n_docs, dtype=np.int64)
    urls = [f"https://example{d % 97}.com/page/{d:08d}" for d in range(n_docs)]
    # html:binary per the input_hint — the raw page whose extraction is
    # byte-identical to `text` (analysis/html.py invariant)
    html = (
        ("<html><body>" + pd.Series(texts) + "</body></html>")
        .str.encode("utf-8")
        .tolist()
    )
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "url": urls,
            "warc_ts": pd.to_datetime("2026-01-01") + pd.to_timedelta(doc_ids, unit="s"),
            "html": html,
            "text": texts,
            "lang": "en",
        }
    )


def corpus_parquet(n_docs: int, cache_dir: str = ".bench_cache", seed: int = 42) -> str:
    """Generate-once parquet cache of the synthetic corpus; returns the path.
    Used by the scaling bench so every parallelism level reads the exact
    same bytes (and generation cost is excluded from timed runs)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    # v2: html column added (input_hint full shape) -> new cache key
    path = os.path.join(cache_dir, f"corpus_n{n_docs}_s{seed}_v2.parquet")
    if not os.path.exists(path):
        pdf = generate_corpus(n_docs, seed=seed)
        # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            path,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return path


REFERENCE_QUERIES: list[tuple[str, str]] = [
    # (query_id, classic-syntax query) — shapes per FIXTURES.md §4
    ("q01_term_high", "w0007"),
    ("q02_term_mid", "w0042"),
    ("q03_term_low", "w1234"),
    ("q04_term", "w0003"),
    ("q05_term_rare", "w9871"),
    ("q06_term_fox", "fox"),
    ("q07_or2", "w0007 w0042"),
    ("q08_or3", "quick fox jumps"),
    ("q09_or4", "w0001 w0002 w0003 w0004"),
    ("q10_and2", "+w0007 +w0042"),
    ("q11_and2b", "+quick +fox"),
    ("q12_and3", "+w0001 +w0002 +w0003"),
    ("q13_andnot", "+w0007 -w0042"),
    ("q14_andnot2", "+fox -w0009"),
    ("q15_phrase", '"w0007 w0042"'),
    ("q16_phrase2", '"quick fox"'),
    ("q17_phrase_stop", '"the quick fox"'),
    ("q19_boost", "w0007^2 w0042"),
    ("q20_mixed", "+w0007 w0042 -w9871"),
]
