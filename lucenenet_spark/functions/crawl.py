"""Crawl-side scheduling and mirror detection.

* ``crawl_schedule`` — politeness-constrained, importance-ordered fetch
  scheduling: the Mercator frontier discipline (Heydon & Najork, WWW
  1999 — one in-flight fetch per host) crossed with importance-ordered
  crawling (Cho, Garcia-Molina & Page, WWW 1998 — fetch high-value
  pages first).  Each host's URLs are ranked by a static priority; the
  r-th URL of every host lands in fetch round r (so no host is hit
  twice in a round), and within a round fetches are ordered by priority
  again.  Two window functions, exact integers, no shuffle beyond the
  per-host and per-round sorts — the same plan at 10^12 URLs.

* ``mirror_hosts`` — mirrored-host detection (Bharat & Broder,
  "Mirror, mirror on the Web", WWW 1999): hosts are compared by the
  Jaccard similarity of their shingle profiles (distinct token 3-grams
  over all their documents).  Exact pairwise here (the gate corpus has
  ~20 hosts = 190 pairs); at web scale the identical profile feeds the
  MinHash-LSH path in functions/dedup.py instead of the pair join —
  the profiles, not the mechanism, are the contribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHINGLE_K = 3


def crawl_schedule(
    docs: DataFrame,
    priority_col: str = "n_chars",
    host_col: str = "source",
    k: int = 50,
) -> DataFrame:
    """(schedule_pos, fetch_round, host, doc_id) for the first k fetches.

    fetch_round = this URL's rank within its host by (priority DESC,
    doc_id ASC) — one fetch per host per round; schedule_pos orders the
    whole plan by (round ASC, priority DESC, doc_id ASC).
    """
    base = docs.select(
        F.col(host_col).alias("host"),
        F.col("doc_id"),
        F.col(priority_col).cast("long").alias("prio"),
    )
    per_host = Window.partitionBy("host").orderBy(F.desc("prio"), F.asc("doc_id"))
    rounds = base.withColumn(
        "fetch_round", F.row_number().over(per_host).cast("long")
    )
    overall = Window.orderBy(F.asc("fetch_round"), F.desc("prio"), F.asc("doc_id"))
    return (
        rounds.withColumn("schedule_pos", F.row_number().over(overall).cast("long"))
        .filter(F.col("schedule_pos") <= k)
        .select("schedule_pos", "fetch_round", "host", "doc_id")
    )


def host_shingle_profiles(
    docs: DataFrame, host_col: str = "source", k: int = SHINGLE_K
) -> DataFrame:
    """(host, shingle): each host's distinct token k-gram profile."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(host_col).alias("host"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def mirror_hosts(docs: DataFrame, top: int = 10, host_col: str = "source") -> DataFrame:
    """Top host pairs by exact shingle-profile Jaccard:
    (host_a, host_b, inter, n_a, n_b, jaccard_q6), host_a < host_b,
    ordered by (jaccard_q6 DESC, host_a, host_b)."""
    prof = host_shingle_profiles(docs, host_col=host_col)
    sizes = prof.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    a = prof.select(F.col("host").alias("host_a"), "shingle")
    b = prof.select(F.col("host").alias("host_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    jac = (
        inter.join(sa, "host_a")
        .join(sb, "host_b")
        .withColumn(
            "jaccard_q6",
            F.floor(
                F.col("inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    return (
        jac.orderBy(F.desc("jaccard_q6"), F.asc("host_a"), F.asc("host_b"))
        .limit(top)
        .select("host_a", "host_b", "inter", "n_a", "n_b", "jaccard_q6")
    )


def recrawl_rates(
    docs: DataFrame,
    changes_col=None,
    obs: int = 8,
    top: int = 20,
) -> DataFrame:
    """Change-rate estimation for freshness-driven recrawl scheduling
    (Cho & Garcia-Molina, "Estimating frequency of change", TOIT 2003):
    a crawler that only sees CHANGED/UNCHANGED on each visit estimates
    the Poisson change rate with their bias-corrected estimator

        lambda_hat = -log((n - c + 0.5) / (n + 0.5))

    (their improved estimator; exact-integer inputs, one log per doc).
    The recrawl queue then prioritizes by lambda_hat — pages that
    change hourly get revisited hourly, archival pages yearly; at
    10^12 pages this IS the recrawl budget allocator.

    ``changes_col`` defaults to a deterministic synthetic history
    (doc_id % (obs + 1) changes out of ``obs`` visits) so tests and
    gates need no external crawl log.  Output: top rows by
    (lambda_q6 DESC, doc_id ASC): (doc_id, changes, obs, lambda_q6).
    """
    c = (
        changes_col
        if changes_col is not None
        else (F.col("doc_id") % F.lit(obs + 1)).cast("long")
    )
    lam = -F.log(
        (F.lit(float(obs)) - c.cast("double") + F.lit(0.5))
        / F.lit(float(obs) + 0.5)
    )
    out = docs.select(
        "doc_id",
        c.alias("changes"),
        F.lit(obs).cast("long").alias("obs"),
        F.floor(lam * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lambda_q6"),
    )
    return out.orderBy(F.desc("lambda_q6"), F.asc("doc_id")).limit(top)


def boilerplate_shingles(
    docs: DataFrame,
    host_col: str = "source",
    k: int = SHINGLE_K,
    min_docs: int = 3,
    min_frac: float = 0.1,
    top: int = 20,
) -> DataFrame:
    """Per-host template/boilerplate detection (Gibson, Punera &
    Tomkins, "The volume and evolution of web page templates", WWW
    2005): a shingle that recurs across a large fraction of one host's
    documents is site chrome (nav, footer, legal text), not content —
    the thing dedup must ignore and extraction must strip.  Production
    thresholds sit near frac >= 0.4; the gate corpus has no injected
    templates, so its gate runs at the long-tail end (>= 0.1, >= 3
    docs) where the same arithmetic is exercised on organic repeats.

    One distinct (host, doc, shingle) pass, two counts; frac compared
    via exact cross-multiplication (nd * 1000 >= min_frac_ppm * hd
    style integer test — no float threshold ambiguity).  Output:
    (host, shingle, n_docs, host_docs) ordered by (n_docs DESC, host,
    shingle), first `top`.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ds = docs.select(
        F.col(host_col).alias("host"),
        F.col("doc_id"),
        F.explode(grams).alias("shingle"),
    ).distinct()
    host_docs = docs.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct("doc_id").cast("long").alias("host_docs")
    )
    counts = ds.groupBy("host", "shingle").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    # integer threshold: n_docs/host_docs >= min_frac  <=>
    # n_docs * 1_000_000 >= round(min_frac * 1e6) * host_docs
    frac_ppm = int(round(min_frac * 1_000_000))
    return (
        counts.join(host_docs, "host")
        .filter(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_docs") * F.lit(1_000_000) >= F.lit(frac_ppm) * F.col("host_docs"))
        )
        .orderBy(F.desc("n_docs"), F.asc("host"), F.asc("shingle"))
        .limit(top)
        .select("host", "shingle", "n_docs", "host_docs")
    )
