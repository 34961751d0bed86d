"""Text-analysis operators for the training-data pipeline surface.

All computed with native ``pyspark.sql.functions`` (JVM, codegen) —
no Python in the hot path. Each operator has a DuckDB-SQL twin in
``plans/queries.py`` built from the *same formula*, chosen so both
engines produce bit-identical results:

* token counting — separator-counting arithmetic
  (``length(x) - length(replace(x,' ','')) + 1``), not regex (regex
  dialects differ between engines);
* quality features — pure length/replace arithmetic;
* language-ID — deterministic marker-token frequency heuristic;
* fingerprinting — ``md5`` of the text (identical bytes → identical
  hex in every engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and")
# marker tokens for the n-gram language heuristic (closed-world vocab)
LANG_MARKERS = {
    "en": ("the", "value", "fast"),
    "zh": ("big", "merge"),
    "es": ("data", "sort"),
}


def occurrences(text: Column, needle: str) -> Column:
    """# of occurrences of ``needle`` — (len - len(remove)) / len(needle)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def occurrences_sql(text: str, needle: str) -> str:
    quoted = needle.replace("'", "''")
    return (
        f"CAST((LENGTH({text}) - LENGTH(REPLACE({text}, '{quoted}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space separated corpus)."""
    return occurrences(text, " ") + 1


def token_count_sql(text: str) -> str:
    return f"({occurrences_sql(text, ' ')} + 1)"


def with_quality(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality-scoring features (length / token / stopword ratios) —
    the document-quality scorer of a pretraining pipeline. All native
    column arithmetic."""
    t = F.col(text)
    n_tokens = token_count(t)
    stop_hits = sum(
        (occurrences(t, f" {w} ") for w in STOPWORDS[1:]),
        occurrences(t, f" {STOPWORDS[0]} "),
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_m", F.length(t).cast("long"))
        .withColumn(
            "avg_token_len",
            F.round((F.length(t) - n_tokens + 1).cast("double") / n_tokens.cast("double"), 6),
        )
        .withColumn("stopword_hits", stop_hits)
        .withColumn(
            "quality_ok",
            (n_tokens >= 8) & (F.col("avg_token_len") < 12.0),
        )
    )


def quality_sql(text: str = "text") -> dict[str, str]:
    nt = token_count_sql(text)
    stop = " + ".join(occurrences_sql(text, f" {w} ") for w in STOPWORDS)
    return {
        "n_tokens": nt,
        "n_chars_m": f"CAST(LENGTH({text}) AS BIGINT)",
        "avg_token_len": f"ROUND(CAST(LENGTH({text}) - {nt} + 1 AS DOUBLE) / {nt}, 6)",
        "stopword_hits": f"({stop})",
        "quality_ok": f"({nt} >= 8 AND ROUND(CAST(LENGTH({text}) - {nt} + 1 AS DOUBLE) / {nt}, 6) < 12.0)",
    }


def with_lang_guess(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-frequency language heuristic (n-gram LM stand-in).

    Deterministic CASE over marker-token counts; ties resolve in
    declaration order (en > zh > es > unknown)."""
    t = F.col(text)
    scores = {
        lang: sum(
            (occurrences(t, f" {m} ") for m in markers[1:]),
            occurrences(t, f" {markers[0]} "),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    en, zh, es = scores["en"], scores["zh"], scores["es"]
    guess = (
        F.when((en >= zh) & (en >= es) & (en > 0), F.lit("en"))
        .when((zh >= es) & (zh > 0), F.lit("zh"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn("lang_guess", guess)


def lang_guess_sql(text: str = "text") -> str:
    def score(markers):
        return "(" + " + ".join(occurrences_sql(text, f" {m} ") for m in markers) + ")"

    en = score(LANG_MARKERS["en"])
    zh = score(LANG_MARKERS["zh"])
    es = score(LANG_MARKERS["es"])
    return (
        f"CASE WHEN {en} >= {zh} AND {en} >= {es} AND {en} > 0 THEN 'en' "
        f"WHEN {zh} >= {es} AND {zh} > 0 THEN 'zh' "
        f"WHEN {es} > 0 THEN 'es' ELSE 'unknown' END"
    )


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprint: md5 hex of the text bytes (stable across
    engines; the rolling-hash variant lives in dedup shingles)."""
    return df.withColumn("fingerprint", F.md5(F.col(text)))


# --- BPE-ish subword pretokenization count ---------------------------------

# GPT-2-style pretokenizer shape restricted to ASCII classes so Java
# (Spark) and RE2 (DuckDB) regex engines agree exactly: letter runs,
# digit runs and punctuation runs, each absorbing one leading space
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Pretokenizer token count — the BPE-ish complement to the
    whitespace count (a BPE tokenizer's unit count is bounded below by
    these pretokens; the ratio whitespace/pretoken flags punctuation-
    or digit-heavy junk documents)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))).cast("long")


def bpe_token_count_sql(text: str) -> str:
    return (
        "CAST(len(regexp_extract_all("
        f"{text}, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT)"
    )
