"""BM25 retrieval scoring — corpus search without an index service.

The decontamination / dedup family answers "is this document a copy?";
BM25 answers the retrieval question a corpus pipeline also needs:
"which documents match this query best?" (eval-set leakage triage,
targeted corpus slicing, quality spot-checks). Reference analog: the
issue-list lookups of ``IssuesUploader`` generalized from exact-key to
ranked text match.

Scoring is the Lucene BM25 variant: for query term t and doc d,

    idf(t)   = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )        (> 0)
    score(d) = Σ_t idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 - b + b·L_d/avgdl))

Determinism: N, df_t, L_d, total token count are exact integers
computed identically on both engines; avgdl enters as the single
division ``total/N`` of those integers. The per-term contributions are
added in EXPLICIT sorted-term order (the query is a literal, so the
sum is a fixed-shape expression, not a float aggregation — no
order-sensitivity). ``ln`` is the one libm call (same situation as
the A-ES sampler); the driver compare's 9-dp rounding absorbs any
sub-ULP cross-engine wobble.

Scale shape: ONE tokenize+explode pass filtered to the query terms
(predicate on the token — pushed ahead of the groupBy, so the shuffle
carries only query-term hits, not the corpus vocabulary), one
groupBy(doc) pivot to per-term tf columns, score as a codegen
expression, top-k via TakeOrderedAndProject (no global sort). Two
driver-side scalar lookups (corpus stats, per-term dfs) are tiny
single-row/|q|-row actions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(query: str) -> list[str]:
    ts = sorted(set(t for t in query.split(" ") if t))
    if not ts:
        raise ValueError("query must contain at least one token")
    return ts


def bm25_topk(df: DataFrame, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query`` (whitespace
    tokens) → ``(id_col, score)``, score DESC with id tiebreak.
    Documents matching no term score 0 and are still eligible (ranked
    by id) — callers wanting hits only filter ``score > 0``."""
    terms = _terms(query)
    toks = df.select(F.col(id_col).alias("_doc"),
                     F.split(F.col(text), " ").alias("_t"))
    lens = toks.select("_doc", F.size("_t").alias("_len"))

    stats = lens.agg(F.count(F.lit(1)).alias("n"),
                     F.sum("_len").alias("tot")).collect()[0]
    if not stats.n:
        raise ValueError("bm25_topk: corpus is empty (no documents)")
    n_docs, total = int(stats.n), int(stats.tot)
    avgdl = total / n_docs  # exact ints -> one identical division

    hits = toks.select(
        "_doc", F.explode("_t").alias("_tok")
    ).where(F.col("_tok").isin(terms))
    # toDF renames the pivot columns POSITIONALLY to tf_0..tf_n (the
    # SQL twin's names): a raw term equal to '_doc'/'_len' or holding
    # '.'/backtick would otherwise collide with internal columns or
    # break F.col name resolution.
    tf = (hits.groupBy("_doc").pivot("_tok", terms).count()
          .toDF("_doc", *[f"tf_{i}" for i in range(len(terms))])
          .na.fill(0))
    dfs = {
        r["_tok"]: int(r["_df"])
        for r in hits.groupBy("_tok")
        .agg(F.count_distinct("_doc").alias("_df")).collect()
    }

    scored = lens.join(tf, "_doc", "left").na.fill(0)
    score = F.lit(0.0)
    for i, t in enumerate(terms):  # fixed sorted order -> deterministic sum
        idf = math.log((n_docs - dfs.get(t, 0) + 0.5)
                       / (dfs.get(t, 0) + 0.5) + 1.0)
        tf_c = F.col(f"tf_{i}").cast("double")
        denom = tf_c + F.lit(float(k1)) * (
            F.lit(1.0 - b) + F.lit(float(b)) * F.col("_len").cast("double")
            / F.lit(float(avgdl)))
        score = score + F.lit(idf) * (tf_c * F.lit(float(k1 + 1.0))) / denom
    return (
        scored.select(F.col("_doc").alias(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_topk_sql(table: str, query: str, k: int = 10,
                  k1: float = 1.2, b: float = 0.75,
                  text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin: same stats from the same integers, same sorted-term
    expression order, same tiebreak."""
    terms = _terms(query)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    term_list = ", ".join(q(t) for t in terms)
    tf_cols = ", ".join(
        f"COALESCE(SUM(CASE WHEN _tok = {q(t)} THEN 1 END), 0) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"COUNT(DISTINCT CASE WHEN _tok = {q(t)} THEN _doc END) AS df_{i}"
        for i, t in enumerate(terms))
    contribs = []
    for i in range(len(terms)):
        idf = (f"LN((s.n - d.df_{i} + 0.5) / (d.df_{i} + 0.5) + 1.0)")
        denom = (f"(CAST(tf.tf_{i} AS DOUBLE) + {float(k1)!r} * "
                 f"({1.0 - b!r} + {float(b)!r} * CAST(l._len AS DOUBLE) "
                 f"/ (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE))))")
        contribs.append(
            f"{idf} * (CAST(tf.tf_{i} AS DOUBLE) * {float(k1 + 1.0)!r}) "
            f"/ {denom}")
    score = "0.0 + " + " + ".join(contribs)
    return f"""
WITH toks AS (
  SELECT {id_col} AS _doc, string_split({text}, ' ') AS _t FROM {table}),
lens AS (SELECT _doc, len(_t) AS _len FROM toks),
s AS (SELECT COUNT(*) AS n, SUM(_len) AS tot FROM lens),
hits AS (
  SELECT _doc, unnest(_t) AS _tok FROM toks),
fhits AS (SELECT * FROM hits WHERE _tok IN ({term_list})),
tf0 AS (SELECT _doc, {tf_cols} FROM fhits GROUP BY _doc),
d AS (SELECT {df_cols} FROM fhits)
SELECT l._doc AS {id_col}, {score} AS score
FROM lens l
LEFT JOIN tf0 tf0j ON tf0j._doc = l._doc, s, d,
LATERAL (SELECT {', '.join(f'COALESCE(tf0j.tf_{i}, 0) AS tf_{i}'
                           for i in range(len(terms)))}) tf
ORDER BY score DESC, {id_col} ASC LIMIT {int(k)}
""".strip()
