"""SweetSpotSimilarity (Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs).

DefaultSimilarity with two tunable curves:
- lengthNorm plateau: norm = 1/sqrt(steepness*(|x-min| + |x-max| -
  (max-min)) + 1) (:142-149) — a flat 1.0 over [min, max], sqrt falloff
  outside; degrades to 1/sqrt(x) at min=max=1, steepness=0.5.
- baselineTf: 0 -> 0; freq <= min -> base; else sqrt(freq + base^2 - min)
  (:162-171); degrades to sqrt(freq) at base=min=0.
- hyperbolicTf: min + (max-min)/2 * (tanh-shaped in base^(x-xoffset)),
  a hard-capped tf for spam-resistant fields (:186-210).

The searcher reuses ClassicSearcher's whole weight lifecycle (queryNorm +
coord) and swaps only the per-posting tf and lengthNorm column factors —
exactly how the reference subclasses DefaultSimilarity.  Length norms are
computed at query time from the doclens column (the index stores the
default-similarity norm byte; recomputing from dl is the per-field-
similarity seam — same information, no second norm column).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.classic import ClassicSearcher

f32 = np.float32


def compute_length_norm(num_terms: int, ln_min: int = 1, ln_max: int = 1,
                        steepness: float = 0.5) -> float:
    """ComputeLengthNorm (:142-149), float32 op order."""
    s, l, h = f32(steepness), ln_min, ln_max
    inner = f32(s * f32(abs(num_terms - l) + abs(num_terms - h) - (h - l)))
    return float(f32(1.0 / np.sqrt(f32(inner + f32(1.0)), dtype=np.float64)))


def baseline_tf(freq: float, tf_base: float = 0.0, tf_min: float = 0.0) -> float:
    """BaselineTf (:162-171)."""
    if freq == 0.0:
        return 0.0
    if freq <= tf_min:
        return float(f32(tf_base))
    return float(f32(np.sqrt(f32(freq + f32(tf_base) * f32(tf_base) - f32(tf_min)))))


def hyperbolic_tf(freq: float, h_min: float = 0.0, h_max: float = 2.0,
                  h_base: float = 1.3, xoffset: float = 10.0) -> float:
    """HyperbolicTf (:186-210)."""
    if freq == 0.0:
        return 0.0
    x = float(freq - xoffset)
    th = (h_base ** x - h_base ** -x) / (h_base ** x + h_base ** -x)
    return float(f32(h_min + f32((h_max - h_min) / 2.0 * (th + 1.0))))


class SweetSpotSearcher(ClassicSearcher):
    """Classic TFIDF execution with SweetSpot tf + lengthNorm curves.
    mode='double' (the oracle-differential mode); the float32 scalar
    functions above carry the bit-level parity tests."""

    def __init__(self, index: InvertedIndex, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0):
        super().__init__(index, mode="double")
        self.ln_min = ln_min
        self.ln_max = ln_max
        self.steepness = steepness
        self.tf_base = tf_base
        self.tf_min = tf_min

    def _tf_col_double(self):
        t = F.col("tf").cast("double")
        return F.when(t <= F.lit(float(self.tf_min)), F.lit(float(self.tf_base))).otherwise(
            F.sqrt(t + F.lit(float(self.tf_base) ** 2 - float(self.tf_min)))
        )

    def _norm_col_double(self):
        x = F.col("dl").cast("double")
        l, h, s = float(self.ln_min), float(self.ln_max), float(self.steepness)
        inner = F.lit(s) * (F.abs(x - F.lit(l)) + F.abs(x - F.lit(h)) - F.lit(h - l))
        return F.lit(1.0) / F.sqrt(inner + F.lit(1.0))
