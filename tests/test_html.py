"""HTML extraction: the input_hint per-row invariant — byte-identical
extracted text per url (extract(html) == text)."""

import pandas as pd

from lucenenet_spark.analysis.html import (
    extract_text_batch,
    extraction_invariant_violations,
    with_extracted_text,
)


def test_extract_batch_shapes():
    s = extract_text_batch(
        pd.Series(
            [
                "<html><body>hello world</body></html>",
                "<html><head><script>var x=1;</script></head><body>a &amp; b</body></html>",
                "<div>x<!-- comment -->y</div>",
                None,
            ]
        )
    )
    assert s.tolist() == ["hello world", "a & b", "xy", ""]


def test_extract_bytes_input():
    s = extract_text_batch(pd.Series([b"<html><body>bytes text</body></html>"]))
    assert s.tolist() == ["bytes text"]


def test_corpus_invariant(spark):
    rows = [
        (f"https://example.com/{i}", f"doc {i} text tokens", f"<html><body>doc {i} text tokens</body></html>".encode())
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "url string, text string, html binary")
    viol = extraction_invariant_violations(df)
    assert viol.count() == 0

    # and the extraction pipeline reproduces the text column exactly
    ext = with_extracted_text(df.select("url", "html"), out_col="text")
    got = {r["url"]: r["text"] for r in ext.collect()}
    exp = {r[0]: r[1] for r in rows}
    assert got == exp


def test_generated_corpus_matches_input_hint_shape():
    """testgen emits EXACTLY the input_hint table shape (url, warc_ts,
    html:binary, text, lang) and satisfies the per-row extraction
    invariant byte-identically."""
    from lucenenet_spark.testgen import generate_corpus

    pdf = generate_corpus(300, seed=7)
    assert list(pdf.columns) == ["doc_id", "url", "warc_ts", "html", "text", "lang"]
    assert isinstance(pdf["html"].iloc[0], bytes)
    ext = extract_text_batch(pdf["html"])
    assert (ext == pdf["text"]).all()
