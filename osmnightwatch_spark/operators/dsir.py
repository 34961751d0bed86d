"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

The data-selection stage of a pretraining pipeline: given a small
TARGET corpus (the distribution you want — Wikipedia, a domain slice)
and a huge RAW pool, estimate per-document importance weights
log(p_target(x) / p_raw(x)) under hashed-n-gram bag models and
resample the pool proportionally — raw documents that "read like" the
target are kept. Reference-ancestry analog: the expected-vs-actual
scoring joins of the admin validator (``AdminCountPerCountryAnalyzer``
ranks actual entities against an expected profile), generalized from
exact ids to distributional text features.

Model (paper's recipe, made engine-exact):

* features: unigrams + bigrams of whitespace tokens, hashed into
  ``buckets`` (default 4096) via the repo's md5-prefix idiom —
  identical on both engines;
* bucket model per corpus: add-1-smoothed multinomial,
  ``p_b = (c_b + 1) / (tot + B)``;
* per-bucket weight: ``w_b = round(quant · (ln(ct_b+1) − ln(tot_t+B)
  − ln(cr_b+1) + ln(tot_r+B)))`` — an INTEGER (micro-nats by
  default), so the per-doc score ``Σ_grams w_bucket(gram)`` is exact
  integer arithmetic: order-free across partitions/engines (the
  ``lang_ngram``/``lm_score`` quantization discipline, text.py);
* resampling: Gumbel-top-m — ``skey = logw/quant − ln(−ln u)`` with
  the deterministic hash-uniform ``u`` of ``sampling.weighted_sample``;
  the top m keys are a without-replacement sample ∝ softmax(logw)
  (Gumbel-max), rerun/resume/repartition-stable and per-row auditable.

Scale shape (100 TB): the two trainers are one explode + one
map-side-combining groupBy each, collecting a BUCKETS-sized frame
(4096 rows — dim-sized like the lang profile, broadcast back);
scoring is one explode + one broadcast join + one groupBy(doc);
resampling compiles to TakeOrderedAndProject (no global sort). No
Python in any per-row path.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _ngram_expr

DSIR_BUCKETS = 4096
DSIR_QUANT = 1_000_000


def _grams_expr(text: str) -> str:
    """Unigram + bigram feature array (duplicates kept — bag model).
    A one-token doc contributes its token twice (the degenerate
    bigram clamp), identically on both engines."""
    return f"concat({_ngram_expr(text, 1)}, {_ngram_expr(text, 2)})"


def _bucket_col(gram) -> "F.Column":
    return (F.conv(F.substring(F.md5(gram), 1, 6), 16, 10).cast("long")
            % DSIR_BUCKETS)


def dsir_bucket_weights(target: DataFrame, raw: DataFrame,
                        text: str = "text",
                        quant: int = DSIR_QUANT) -> pd.DataFrame:
    """Train both hashed-n-gram bucket models and return the complete
    ``buckets``-row integer weight table ``(b, w)`` — every bucket
    present (absent buckets get the c=0 smoothed weight), so scoring
    can use a plain inner join."""
    def counts(df: DataFrame) -> tuple[dict[int, int], int]:
        pdf = (
            df.select(F.explode(F.expr(_grams_expr(text))).alias("g"))
            .select(_bucket_col(F.col("g")).alias("b"))
            .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
            .toPandas()
        )
        return dict(zip(pdf["b"].astype(int), pdf["c"].astype(int))), \
            int(pdf["c"].sum())

    ct, tot_t = counts(target)
    cr, tot_r = counts(raw)
    lt = math.log(tot_t + DSIR_BUCKETS)
    lr = math.log(tot_r + DSIR_BUCKETS)
    rows = [
        (b, round(quant * (math.log(ct.get(b, 0) + 1) - lt
                           - math.log(cr.get(b, 0) + 1) + lr)))
        for b in range(DSIR_BUCKETS)
    ]
    return pd.DataFrame(rows, columns=["b", "w"])


def dsir_logweights(df: DataFrame, weights: pd.DataFrame,
                    id_col: str = "doc_id",
                    text: str = "text") -> DataFrame:
    """Per-document integer log-importance ``(id_col, dsir_logw_q)`` =
    Σ over the doc's grams of the bucket weight (exact integer sum)."""
    spark = df.sparkSession
    wdf = spark.createDataFrame(weights)
    g = df.select(F.col(id_col),
                  F.explode(F.expr(_grams_expr(text))).alias("g"))
    j = g.select(id_col, _bucket_col(F.col("g")).alias("b")) \
         .join(F.broadcast(wdf), "b")
    return j.groupBy(id_col).agg(F.sum("w").alias("dsir_logw_q"))


def dsir_sample(raw: DataFrame, target: DataFrame, m: int,
                id_col: str = "doc_id", text: str = "text",
                quant: int = DSIR_QUANT) -> DataFrame:
    """End-to-end DSIR: train on (target, raw), score raw, Gumbel-top-m
    resample → ``(id_col, dsir_logw_q, skey)``, ``skey`` descending
    with id tiebreak.

    ``skey = logw/quant − ln(−ln u)`` with the hash-uniform
    ``u = (md5_24(id)+0.5)/16⁶``: Gumbel-max sampling ∝
    softmax(logw) without replacement, fully deterministic.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    w = dsir_bucket_weights(target, raw, text=text, quant=quant)
    scored = dsir_logweights(raw, w, id_col=id_col, text=text)
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("double") + 0.5
    ) / float(16 ** 6)
    skey = (F.col("dsir_logw_q").cast("double") / F.lit(float(quant))
            - F.log(-F.log(u)))
    return (
        scored.withColumn("skey", skey)
        .orderBy(F.col("skey").desc(), F.col(id_col))
        .limit(m)
    )


def dsir_sample_sql(raw_sql: str, target_sql: str, m: int,
                    id_col: str = "doc_id", text: str = "text",
                    quant: int = DSIR_QUANT) -> str:
    """DuckDB twin: the SAME training + scoring + Gumbel key derived
    from scratch in SQL (md5 buckets, add-1 smoothing, integer weight
    rounding, hash-uniform Gumbel, id tiebreak)."""
    B = DSIR_BUCKETS

    def grams(src: str) -> str:
        # unigrams (k=0) UNION ALL bigrams (k=1), clamped like Spark
        return f"""
  SELECT {id_col}, array_to_string(tk[p:p+0], ' ') AS g
  FROM (SELECT {id_col}, string_split({text}, ' ') AS tk FROM ({src})) t0,
       UNNEST(generate_series(1, greatest(len(tk) - 0, 1))) u0(p)
  UNION ALL
  SELECT {id_col}, array_to_string(tk[p:p+1], ' ') AS g
  FROM (SELECT {id_col}, string_split({text}, ' ') AS tk FROM ({src})) t1,
       UNNEST(generate_series(1, greatest(len(tk) - 1, 1))) u1(p)
""".strip()

    bucket = f"CAST('0x' || substr(md5(g), 1, 6) AS BIGINT) % {B}"
    u = (f"(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 6) "
         f"AS BIGINT) + 0.5) / {float(16 ** 6)!r}")
    return f"""
WITH tg AS MATERIALIZED (SELECT {bucket} AS b FROM ({grams(target_sql)})),
rg AS MATERIALIZED (
  SELECT {id_col}, {bucket} AS b FROM ({grams(raw_sql)})),
ct AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1),
cr AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM rg GROUP BY 1),
tots AS (SELECT (SELECT count(*) FROM tg) AS tt, (SELECT count(*) FROM rg) AS tr),
w AS (
  SELECT ab.b,
         CAST(round({int(quant)} * (ln(coalesce(ct.c, 0) + 1)
                                    - ln(tots.tt + {B})
                                    - ln(coalesce(cr.c, 0) + 1)
                                    + ln(tots.tr + {B}))) AS BIGINT) AS w
  FROM (SELECT UNNEST(generate_series(0, {B - 1})) AS b) ab
  LEFT JOIN ct ON ct.b = ab.b LEFT JOIN cr ON cr.b = ab.b, tots),
scored AS (
  SELECT rg.{id_col}, CAST(SUM(w.w) AS BIGINT) AS dsir_logw_q
  FROM rg JOIN w ON w.b = rg.b GROUP BY 1)
SELECT {id_col}, dsir_logw_q,
       CAST(dsir_logw_q AS DOUBLE) / {float(quant)!r} - LN(-LN({u})) AS skey
FROM scored ORDER BY skey DESC, {id_col} LIMIT {int(m)}
""".strip()
