"""End-to-end corpus curation: the published filters composed in order.

The standard web-curation recipe (C4/Gopher/CCNet lineage) is a staged
funnel, each stage seeing only the previous stage's survivors:

1. **Quality rules** — Gopher document-shape rules
   (functions/quality_rules.py).
2. **Exact dedup, first-wins** — byte-identical documents collapse to
   their minimum id (functions/dedup.py's hash groups).
3. **LM quality cut** — corpus-unigram mean log-probability threshold
   over the deduped survivors (functions/lm_quality.py; the model is fit
   on the funnel input it scores, as CCNet fits on its own snapshot).
4. **Deterministic subsample** — hash-based fraction keep
   (functions/sampling.py), the final size control.

Each stage is individually gated elsewhere; this module (and its
``curation_pipeline`` gate) verifies the COMPOSITION — stage ordering,
survivor threading, and the audit columns — end to end against one
chained SQL oracle. Every stage is shuffle-minimal by construction
(per-row rules, one hash groupBy, one broadcast-model join, a pure
filter), so the funnel adds nothing beyond its stages' own plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.lm_quality import unigram_logprob
from lucenenet_spark.functions.quality_rules import gopher_quality_filter
from lucenenet_spark.functions.sampling import deterministic_sample

__all__ = ["curate"]


def curate(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    lm_min_avg_logprob: float = -3.45,
    sample_fraction: float = 0.8,
    salt: str = "curate",
) -> DataFrame:
    """(id, n_tokens, avg_logprob_q): the documents surviving the full
    funnel, with the LM stage's audit columns attached. Thresholds are
    corpus-tuned parameters; defaults suit the synthetic webtext tables.
    """
    # 1. Gopher document-shape rules
    s1 = gopher_quality_filter(
        docs, text_col=text_col, id_col=id_col, min_words=min_words
    )
    # 2. exact dedup, first-wins: keep each content hash's minimum id
    keep = (
        s1.groupBy(F.md5(F.col(text_col).cast("binary")).alias("_h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )
    s2 = s1.join(keep, id_col, "left_semi")
    # 3. LM quality cut, model fit on the deduped survivors
    import math

    stats = unigram_logprob(s2, text_col=text_col, id_col=id_col)
    s3 = stats.filter(
        F.col("avg_logprob_q") >= math.floor(lm_min_avg_logprob * 10000)
    )
    # 4. deterministic subsample
    return deterministic_sample(
        s3, sample_fraction, id_col=id_col, salt=salt
    ).select(id_col, "n_tokens", "avg_logprob_q")
