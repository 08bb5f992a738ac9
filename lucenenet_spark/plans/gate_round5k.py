"""Gate registry part 5k: BooleanPerceptronClassifier — the third and
last Lucene.Net.Classification classifier
(src/Lucene.Net.Classification/BooleanPerceptronClassifier.cs) as an
epoch-synchronous batch perceptron — and the bloom-filtered term seek
(src/Lucene.Net.Codecs/Bloom/BloomFilteringPostingsFormat.cs) as parquet
column bloom filters on the saved index layout."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _Q,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)

# ==========================================================================
# BooleanPerceptronClassifier: train on docs with doc_id % 5 != 0 labeled
# y = (lang = 'en'), threshold = sum(training tf) / 2 (the reference's
# automatic threshold is the field's sumDocFreq / 2 —
# BooleanPerceptronClassifier.cs Train()); classify the held-out fifth.
# Batch (epoch-synchronous) update schedule, 2 epochs — see
# functions/classify.py for the documented deviation from the reference's
# sequential online loop. Pure integer arithmetic on both sides
# (2*score >= 2*threshold), so the hashes match exactly.
# ==========================================================================
@gate(
    "boolean_perceptron",
    SQL_PRELUDE + """
, lab AS (SELECT doc_id, (lang = 'en') AS y FROM documents WHERE doc_id % 5 <> 0),
tp AS (SELECT p.* FROM post p JOIN lab USING (doc_id)),
thr AS (SELECT CAST(sum(tf) AS BIGINT) AS t2 FROM tp),
m1 AS (SELECT l.doc_id, l.y FROM lab l, thr WHERE (0 >= thr.t2) <> l.y),
w1 AS (
  SELECT term, CAST(sum(CASE WHEN m.y THEN p.tf ELSE -p.tf END) AS BIGINT) AS w
  FROM tp p JOIN m1 m USING (doc_id) GROUP BY term
),
s2 AS (
  SELECT p.doc_id, CAST(sum(p.tf * w1.w) AS BIGINT) AS score
  FROM tp p JOIN w1 USING (term) GROUP BY p.doc_id
),
m2 AS (
  SELECT l.doc_id, l.y
  FROM lab l LEFT JOIN s2 USING (doc_id), thr
  WHERE ((coalesce(s2.score, 0) * 2) >= thr.t2) <> l.y
),
d2 AS (
  SELECT term, CAST(sum(CASE WHEN m.y THEN p.tf ELSE -p.tf END) AS BIGINT) AS d
  FROM tp p JOIN m2 m USING (doc_id) GROUP BY term
),
w2 AS (
  SELECT coalesce(w1.term, d2.term) AS term,
         CAST(coalesce(w1.w, 0) + coalesce(d2.d, 0) AS BIGINT) AS w
  FROM w1 FULL OUTER JOIN d2 ON w1.term = d2.term
),
ho AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
hs AS (
  SELECT p.doc_id, CAST(sum(p.tf * w2.w) AS BIGINT) AS score
  FROM post p JOIN ho USING (doc_id) JOIN w2 USING (term)
  GROUP BY p.doc_id
)
SELECT h.doc_id, ((coalesce(hs.score, 0) * 2) >= thr.t2) AS pred
FROM ho h LEFT JOIN hs ON h.doc_id = hs.doc_id, thr
""",
)
def boolean_perceptron(spark, sf_dir):
    """Perceptron text classifier over the postings: two shuffles per
    epoch (score-by-doc, update-by-term), weights table vocabulary-sized
    and localCheckpoint'ed between epochs so the lineage stays flat. The
    only driver scalar is the threshold — a single sum, exactly the
    sumDocFreq/2 scalar the reference's Train() computes."""
    from lucenenet_spark.functions.classify import (
        boolean_perceptron_classify,
        boolean_perceptron_weights,
    )

    idx, _s, docs = get_engine(spark, sf_dir)
    post = idx.postings.filter(
        F.col("field") == idx.default_field
    ).select("doc_id", "term", F.col("tf").cast("long").alias("tf"))
    lab = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", (F.col("lang") == "en").alias("y")
    )
    tp = post.join(lab.select("doc_id"), "doc_id")
    t2 = int(tp.agg(F.sum("tf")).first()[0])  # 2 * (sumDocFreq / 2)
    w = boolean_perceptron_weights(tp, lab, t2, epochs=2)
    held_out = docs.filter(F.col("doc_id") % 5 == 0)
    return boolean_perceptron_classify(post, held_out, w, t2)


# ==========================================================================
# Bloom-filtered term seek: save the index with parquet bloom filters on
# the term column, load it back, and score a TermQuery through the saved
# layout. Results must be identical to the in-memory index (bloom filters
# are a pure row-group skipping aid — BloomFilteringPostingsFormat
# delegates to the wrapped format on maybe-hits the same way).
# ==========================================================================
@gate(
    "bloom_term_seek",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('vector')})
""",
)
def bloom_term_seek(spark, sf_dir):
    """TermQuery served from a bloom-enabled on-disk index. The save path
    writes parquet bloom filters sized by expected NDV; a term point seek
    then prunes row groups by bloom BEFORE the min/max range check — the
    BlockTree+bloom combination the reference's Bloom codec provides."""
    from lucenenet_spark.index.builder import InvertedIndex
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, _s, _docs = get_engine(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"lucenenet_spark_bloom_idx_{tag}")
    marker = os.path.join(path, "stats.json")
    if not os.path.exists(marker):
        idx.save(path, bloom_filter_terms=True, term_ndv=1 << 17)
    saved = InvertedIndex.load(spark, path)
    searcher = IndexSearcher(saved, mode="double")
    return _spark_score_q(searcher.scored(TermQuery("vector")))
