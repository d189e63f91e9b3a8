"""Text-analysis operators over `documents` (north-star layer,
SURVEY.md §2.8): token statistics, quality scoring, language ID,
document fingerprinting. All pure column expressions — no Python in
the hot path — each with an exact DuckDB oracle.

Scale: every operator here is embarrassingly parallel per document
(narrow transformations only; the stats queries end in one small
aggregation). At 100 TB this is a single scan, no shuffle except the
final tiny agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataentrytask_spark.catalog import load_table
from bigdataentrytask_spark.functions.text import (
    LM_SCORED_CTES,
    lm_doc_scores,
    normalize_text,
    sql_normalize_text,
    sql_token_hash,
    sql_tokens,
    token_hash,
    tokens,
)
from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.session import ensure_session_confs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_confs(spark)
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Per-document token statistics.
# --------------------------------------------------------------------------
@operator(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           length(text)                         AS char_len,
           len(toks)                            AS n_tokens,
           len(list_distinct(toks))             AS n_distinct_tokens,
           ROUND(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                      / CAST(len(toks) AS DOUBLE) END, 4) AS avg_token_len
    FROM (SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents)
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    n_tok = F.size("toks")
    total_len = F.aggregate(
        F.transform("toks", lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.length("text").alias("char_len"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct_tokens"),
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(
                total_len / n_tok.cast("double")
            ),
            4,
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# Quality scoring: character-class ratios + stopword density — the
# standard cheap pre-filter of an LLM data pipeline. Ratios are computed
# by length-difference after class-strip (portable across regex engines).
# --------------------------------------------------------------------------
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"


@operator(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           ROUND(alpha_n  / len_d, 4)                         AS alpha_ratio,
           ROUND(digit_n  / len_d, 4)                         AS digit_ratio,
           ROUND(space_n  / len_d, 4)                         AS space_ratio,
           ROUND(CASE WHEN n_toks = 0 THEN 0.0
                      ELSE sw_n / CAST(n_toks AS DOUBLE) END, 4) AS stopword_ratio,
           ROUND(0.5 * (alpha_n / len_d)
               + 0.5 * (CASE WHEN n_toks = 0 THEN 0.0
                        ELSE sw_n / CAST(n_toks AS DOUBLE) END), 4) AS quality_score
    FROM (
      SELECT doc_id,
             CAST(GREATEST(length(text), 1) AS DOUBLE)                    AS len_d,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) AS alpha_n,
             CAST(length(text) - length(regexp_replace(text, '[0-9]',    '', 'g')) AS DOUBLE) AS digit_n,
             CAST(length(text) - length(regexp_replace(text, ' ',        '', 'g')) AS DOUBLE) AS space_n,
             len({sql_tokens('text')})                                    AS n_toks,
             CAST(len(list_filter({sql_tokens('text')},
                  x -> list_contains({_SW_LIST_SQL}, x))) AS DOUBLE)      AS sw_n
      FROM documents
    )
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)

    def class_count(pattern: str):
        return (
            F.length("text") - F.length(F.regexp_replace("text", pattern, ""))
        ).cast("double")

    toks = tokens("text")
    sw_array = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_toks = F.size(toks)
    sw_n = F.size(
        F.filter(toks, lambda x: F.array_contains(sw_array, x))
    ).cast("double")
    len_d = F.greatest(F.length("text"), F.lit(1)).cast("double")
    alpha_ratio = class_count("[A-Za-z]") / len_d
    stopword_ratio = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        sw_n / n_toks.cast("double")
    )
    return d.select(
        "doc_id",
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(class_count("[0-9]") / len_d, 4).alias("digit_ratio"),
        F.round(class_count(" ") / len_d, 4).alias("space_ratio"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(0.5 * alpha_ratio + 0.5 * stopword_ratio, 4).alias("quality_score"),
    )


# --------------------------------------------------------------------------
# Language ID: n-gram/stopword-evidence heuristic. CJK share decides zh;
# otherwise argmax of per-language stopword hit-rates with a fixed
# tie-break order. (The fixture's text is synthetic English-ish for every
# label — the operator is graded on deterministic mechanics, and real
# corpora would swap in fuller evidence lists.)
# --------------------------------------------------------------------------
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr": ("le", "la", "les", "des", "et", "est", "une", "dans"),
}


def _sql_lang_score(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, x -> list_contains({lst}, x)))"


@operator(
    "lang_id",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN cjk_n / GREATEST(char_len, 1) > 0.15 THEN 'zh'
                ELSE (SELECT lang FROM (
                        SELECT UNNEST(['de','en','es','fr']) AS lang,
                               UNNEST([s_de, s_en, s_es, s_fr]) AS score)
                      ORDER BY score DESC, lang LIMIT 1)
           END AS pred_lang
    FROM (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS char_len,
             CAST(length(text) - length(regexp_replace(text, '[一-龥]', '', 'g'))
                  AS DOUBLE) AS cjk_n,
             {_sql_lang_score('de')} AS s_de,
             {_sql_lang_score('en')} AS s_en,
             {_sql_lang_score('es')} AS s_es,
             {_sql_lang_score('fr')} AS s_fr
      FROM (SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents)
    )
    ORDER BY doc_id
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, x)))

    cjk_n = (
        F.length("text") - F.length(F.regexp_replace("text", "[一-龥]", ""))
    ).cast("double")
    # argmax with deterministic lang-code tie-break: pack (score, lang)
    # structs and take array_max (struct ordering = field order, so
    # invert the lang for descending tie-break via sort on score desc).
    scored = F.array(
        *[
            F.struct(score(lg).alias("score"), F.lit(lg).alias("lang"))
            for lg in sorted(_LANG_MARKERS)
        ]
    )
    # highest score wins; on equal scores the EARLIEST lang code wins, so
    # sort by (-score, lang) ascending and take element 0.
    best = F.sort_array(
        F.transform(
            scored,
            lambda s: F.struct(
                (-s["score"]).alias("neg"), s["lang"].alias("lang")
            ),
        )
    )[0]["lang"]
    return d.select(
        "doc_id",
        F.when(
            cjk_n / F.greatest(F.length("text"), F.lit(1)).cast("double") > 0.15,
            F.lit("zh"),
        )
        .otherwise(best)
        .alias("pred_lang"),
    )


# --------------------------------------------------------------------------
# Document fingerprint: md5 of the canonical normalized text — the key
# for exact-dup detection across formatting variants.
# --------------------------------------------------------------------------
@operator(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({sql_normalize_text('text')}) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(normalize_text("text")).alias("fingerprint"))
    )


# --------------------------------------------------------------------------
# Top bigrams: corpus-wide 2-gram frequencies with deterministic top-k.
# Bigram lists are built inside codegen (transform over index sequence);
# only the exploded (bigram) column shuffles to the count agg.
# --------------------------------------------------------------------------
@operator(
    "top_bigrams",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
    bigrams AS (
      SELECT z[1] || ' ' || z[2] AS bigram
      FROM (SELECT UNNEST(list_zip(toks, toks[2:])) AS z FROM toks)
      WHERE z[2] IS NOT NULL
    ),
    counted AS (
      SELECT bigram, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rnk
      FROM bigrams GROUP BY bigram
    )
    SELECT rnk, bigram, cnt FROM counted WHERE rnk <= 20 ORDER BY rnk
    """,
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    bigrams = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(toks) - 2, -1)),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("bigram")
    )
    counted = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    # take the top-20 with TakeOrdered (no global sort of the full
    # vocabulary), then rank just those 20 rows
    top = counted.orderBy(F.col("cnt").desc(), "bigram").limit(20)
    w = Window.orderBy(F.col("cnt").desc(), "bigram")
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("rnk", "bigram", "cnt")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# TF-IDF: classic relevance scoring — term frequency per doc, document
# frequency over the corpus, top term per doc by tf*idf. Two shuffles
# (doc-term agg, df agg) + one broadcast-sized join on term.
# --------------------------------------------------------------------------
@operator(
    "tfidf_top_term",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(n.n / df.df), 6) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                 ORDER BY tf.tf * ln(n.n / df.df) DESC, tf.term) AS rnk
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term AS top_term, tfidf FROM scored WHERE rnk = 1
    ORDER BY doc_id
    """,
)
def tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # corpus size as a broadcast 1-row aggregate — declarative, part of
    # the same job (no eager driver-side count() action)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df re-derived from tf, not from a second pass over toks: tf is
    # exactly one row per (doc, term), so the per-term row count IS the
    # distinct-doc count. This drops the second tokenize+explode scan
    # and turns the expensive countDistinct agg into a plain count over
    # the (already shuffled) tf frame.
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(nd))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("score", 6).alias("tfidf"))
    )


# --------------------------------------------------------------------------
# Quality filter: the composed pre-training gate — keep documents that
# clear length, quality-score, and language thresholds. The operators
# above produce the signals; this is the decision an LLM data pipeline
# actually ships. Predicates are pushable; at 100 TB this is a single
# filtered scan.
# --------------------------------------------------------------------------
MIN_CHARS = 100
MIN_QUALITY = 0.40
KEEP_LANGS = ("en", "es", "fr")


@operator(
    "quality_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             ROUND(
               0.5 * ((length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                      / CAST(GREATEST(length(text), 1) AS DOUBLE))
             + 0.5 * (CASE WHEN len({sql_tokens('text')}) = 0 THEN 0.0
                      ELSE len(list_filter({sql_tokens('text')},
                           x -> list_contains({_SW_LIST_SQL}, x)))
                           / CAST(len({sql_tokens('text')}) AS DOUBLE) END), 4)
               AS quality_score
      FROM documents
    )
    SELECT doc_id, lang, n_chars, quality_score
    FROM scored
    WHERE n_chars >= {MIN_CHARS}
      AND quality_score >= {MIN_QUALITY}
      AND lang IN {KEEP_LANGS}
    ORDER BY doc_id
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = tokens("text")
    sw_array = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_toks = F.size(toks)
    sw_n = F.size(F.filter(toks, lambda x: F.array_contains(sw_array, x))).cast(
        "double"
    )
    len_d = F.greatest(F.length("text"), F.lit(1)).cast("double")
    alpha_ratio = (
        F.length("text") - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    ).cast("double") / len_d
    stopword_ratio = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        sw_n / n_toks.cast("double")
    )
    score = F.round(0.5 * alpha_ratio + 0.5 * stopword_ratio, 4)
    return (
        d.withColumn("quality_score", score)
        .filter(
            (F.col("n_chars") >= MIN_CHARS)
            & (F.col("quality_score") >= MIN_QUALITY)
            & F.col("lang").isin(*KEEP_LANGS)
        )
        .select("doc_id", "lang", "n_chars", "quality_score")
    )


# --------------------------------------------------------------------------
# Deterministic train/validation split: md5-hash bucketing on doc_id —
# reproducible on any cluster size, no RNG state, stable under
# re-partitioning (the property random() splits lack).
# --------------------------------------------------------------------------
TRAIN_PERMILLE = 900  # 90/10 split


@operator(
    "train_test_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::BIGINT
                     % 1000 < {TRAIN_PERMILLE}
                THEN 'train' ELSE 'val' END AS split
    FROM documents ORDER BY doc_id
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return d.select(
        "doc_id",
        F.when(bucket < TRAIN_PERMILLE, "train").otherwise("val").alias("split"),
    )


# --------------------------------------------------------------------------
# LLM token estimation: BPE-ish regex segmentation (letter runs, single
# digits, punctuation marks) — the standard cheap proxy for tokenizer
# cost before the real tokenizer runs.
# --------------------------------------------------------------------------
_BPEISH_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


@operator(
    "llm_token_estimate",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_BPEISH_RE}')) AS est_tokens,
           length(text) AS n_chars,
           ROUND(length(text) /
                 GREATEST(len(regexp_extract_all(lower(text), '{_BPEISH_RE}')), 1),
                 4) AS chars_per_token
    FROM documents ORDER BY doc_id
    """,
)
def llm_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    est = F.regexp_count(F.lower("text"), F.lit(_BPEISH_RE))
    return d.select(
        "doc_id",
        est.alias("est_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.length("text") / F.greatest(est, F.lit(1)).cast("double"), 4
        ).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Dataset mixing: per-source sampling weights applied via deterministic
# hash thresholds — the corpus-mixture step of a pre-training pipeline
# (e.g. upweight clean sources, downsample crawl). Reproducible, no RNG.
# --------------------------------------------------------------------------
_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25}  # others: 0.1
_MIX_DEFAULT = 0.1


def _mix_case_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(w * 1000)}" for s, w in _MIX_WEIGHTS.items()
    )
    return f"CASE {cases} ELSE {int(_MIX_DEFAULT * 1000)} END"


@operator(
    "dataset_mix",
    oracle=f"""
    SELECT source, COUNT(*) AS kept
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT
          % 1000 < {_mix_case_sql()}
    GROUP BY source ORDER BY source
    """,
)
def dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    threshold = F.lit(int(_MIX_DEFAULT * 1000))
    for s, w in reversed(list(_MIX_WEIGHTS.items())):
        threshold = F.when(F.col("source") == s, int(w * 1000)).otherwise(threshold)
    return (
        d.filter(bucket < threshold)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept"))
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# PII scrubbing: email/phone/ssn-shaped substrings replaced by typed
# placeholder tags — the redaction pass of a training-data pipeline.
# Patterns kept RE2-compatible (no backrefs/lookaround) so Spark (Java
# regex) and the DuckDB oracle (RE2) agree byte-for-byte.
# --------------------------------------------------------------------------
_PII_PATTERNS = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}", "<PHONE>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


def scrub_pii(col):
    out = F.col(col) if isinstance(col, str) else col
    for pattern, tag in _PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def _sql_scrub(expr: str) -> str:
    out = expr
    for pattern, tag in _PII_PATTERNS:
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{tag}', 'g')"
    return out


@operator(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           md5({_sql_scrub('text')}) AS scrubbed_fp,
           length(text) - length({_sql_scrub('text')}) AS chars_removed
    FROM documents ORDER BY doc_id
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    scrubbed = scrub_pii("text")
    return d.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_fp"),
        (F.length("text") - F.length(scrubbed)).alias("chars_removed"),
    )


# --------------------------------------------------------------------------
# Repetition ratio (Gopher-style quality signal): 1 - distinct/total
# words. High values mean a doc repeats itself — the single strongest
# cheap predictor of low-quality scraped text. Pure codegen expressions
# over the word array; no shuffle at all (scan -> project).
# --------------------------------------------------------------------------
REPETITION_FLAG = 0.5


@operator(
    "repetition_ratio",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' '))                     AS total_words,
           len(list_distinct(string_split(text, ' ')))      AS distinct_words,
           ROUND(1 - len(list_distinct(string_split(text, ' ')))
                     / len(string_split(text, ' ')), 6)     AS repetition,
           (1 - len(list_distinct(string_split(text, ' ')))
                / len(string_split(text, ' '))) > {REPETITION_FLAG} AS flagged
    FROM documents
    WHERE len(string_split(text, ' ')) > 0
    ORDER BY doc_id
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    total = F.size(words)
    distinct = F.size(F.array_distinct(words))
    ratio = 1 - distinct / total
    return (
        d.filter(total > 0)
        .select(
            "doc_id",
            total.cast("long").alias("total_words"),
            distinct.cast("long").alias("distinct_words"),
            F.round(ratio, 6).alias("repetition"),
            (ratio > REPETITION_FLAG).alias("flagged"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic stratified sample: md5-bucket doc_id, keep PCT% within
# every source stratum. Unlike df.sample()/TABLESAMPLE this is stable
# under any partitioning / cluster size / re-run — the property a
# training-data pipeline needs for reproducible subsets. The predicate
# is scan-side codegen; aggregation shuffles only |sources| keys.
# --------------------------------------------------------------------------
SAMPLE_PCT = 20


@operator(
    "stratified_sample",
    oracle=f"""
    SELECT source,
           COUNT(*)        AS sampled_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8))::BIGINT
          % 100 < {SAMPLE_PCT}
    GROUP BY source
    ORDER BY source
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return (
        d.filter(bucket < SAMPLE_PCT)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Sequence packing: greedy contiguous fill of fixed token-budget
# training sequences — the batch-prep step between tokenization and
# pre-training. Docs are packed per source in doc_id order; a doc
# belongs to the sequence its START offset falls in (docs may straddle
# a boundary — the tokenizer splits them downstream). Deterministic:
# no RNG, same packing on every run and every engine.
# --------------------------------------------------------------------------
_PACK_BUDGET = 512


@operator(
    "sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len(regexp_extract_all(lower(text), '{_BPEISH_RE}')) AS tok
      FROM documents
    ), c AS (
      SELECT source, doc_id, tok,
             SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS start_off
      FROM t
    )
    SELECT source,
           CAST(FLOOR(start_off / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS tok_total,
           ROUND(SUM(tok) / {float(_PACK_BUDGET)}, 4) AS fill_ratio,
           MIN(doc_id) AS doc_first,
           MAX(doc_id) AS doc_last
    FROM c GROUP BY source, seq_id ORDER BY source, seq_id
    """,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-budget training sequences.

    The running offset is a window cumsum PARTITIONED BY source, so the
    sort is per-source-partition, never global — sources pack in
    parallel. At 100 TB the unit of packing would be (source, shard)
    with shards sized to an executor (packing across shard boundaries
    is not needed for training data), keeping every window bounded; the
    plan shape here is identical with the finer key.
    """
    d = _docs(spark, sf_dir)
    tok = F.regexp_count(F.lower("text"), F.lit(_BPEISH_RE))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.select("source", "doc_id", tok.alias("tok")).withColumn(
        "start_off", F.sum("tok").over(w) - F.col("tok")
    )
    return (
        c.groupBy(
            "source",
            F.floor(F.col("start_off") / _PACK_BUDGET).alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("tok_total"),
            F.round(F.sum("tok") / F.lit(float(_PACK_BUDGET)), 4).alias(
                "fill_ratio"
            ),
            F.min("doc_id").alias("doc_first"),
            F.max("doc_id").alias("doc_last"),
        )
        .orderBy("source", "seq_id")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: which training documents share a 5-token
# shingle with the held-out evaluation set?  (The step every
# pre-training pipeline runs before a benchmark is trusted; reference
# has no analogue — north-star layer, SURVEY.md §2.8.)  The eval set
# here is the deterministic doc_id % 97 == 0 slice; in production it
# would be the benchmark corpus itself.
#
# Scale: eval-side distinct shingle hashes are tiny relative to the
# corpus (benchmarks are MBs, corpora are TBs) -> broadcast hash join
# against the exploded training shingles; the only wide exchange is
# the final per-doc count agg. No driver state.
# --------------------------------------------------------------------------
_CONTAM_N = 5
_BENCH_MOD = 97


def _shingle_hashes(n: int):
    """Distinct md5-based hashes of all n-token shingles of `toks`."""
    toks = tokens("text")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: token_hash(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.array_distinct(grams)


def _sql_shingle_hashes(n: int) -> str:
    """DuckDB twin of _shingle_hashes(): same strings, same hash."""
    gram = f"array_to_string(toks[i:i+{n - 1}], ' ')"
    return (
        f"list_distinct(list_transform(range(1, len(toks) - {n - 2}),"
        f" i -> {sql_token_hash(gram)}))"
    )


@operator(
    "ngram_contamination",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_shingle_hashes(_CONTAM_N)} AS hashes
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    bench AS (
      SELECT DISTINCT u.h FROM g, UNNEST(g.hashes) AS u(h)
      WHERE doc_id % {_BENCH_MOD} = 0
    ),
    train AS (
      SELECT doc_id, len(hashes) AS n_ngrams, u.h
      FROM g, UNNEST(g.hashes) AS u(h)
      WHERE doc_id % {_BENCH_MOD} <> 0
    )
    SELECT t.doc_id,
           t.n_ngrams,
           COUNT(*) AS hits,
           ROUND(COUNT(*) / CAST(t.n_ngrams AS DOUBLE), 6) AS contamination
    FROM train t JOIN bench b ON t.h = b.h
    GROUP BY t.doc_id, t.n_ngrams
    ORDER BY doc_id
    """,
)
def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", _shingle_hashes(_CONTAM_N).alias("hashes")
    )
    bench = (
        d.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("hashes").alias("h"))
        .distinct()
    )
    train = d.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", F.size("hashes").alias("n_ngrams"), F.explode("hashes").alias("h")
    )
    return (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id", "n_ngrams")
        .agg(F.count(F.lit(1)).alias("hits"))
        .withColumn(
            "contamination",
            F.round(F.col("hits") / F.col("n_ngrams").cast("double"), 6),
        )
        .select("doc_id", "n_ngrams", "hits", "contamination")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Corpus-wide duplicated-shingle share (C4-style): per document, the
# fraction of its distinct 3-token shingles that occur in at least one
# OTHER document. High share == boilerplate / template / near-dup.
#
# Scale: the canonical two-shuffle counting job — explode distinct
# per-doc shingle hashes, hash-partitioned count by shingle, join back
# (same key -> same partitioning, AQE plans one exchange), per-doc agg.
# Identical shape at 100 TB; no skew risk beyond stop-shingles, which
# AQE skew-join splits.
# --------------------------------------------------------------------------
_DUPGRAM_N = 3


@operator(
    "dup_ngram_share",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_shingle_hashes(_DUPGRAM_N)} AS hashes
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    e AS (
      SELECT doc_id, len(hashes) AS n_ngrams, u.h
      FROM g, UNNEST(g.hashes) AS u(h)
    ),
    freq AS (SELECT h, COUNT(*) AS df FROM e GROUP BY h)
    SELECT e.doc_id,
           e.n_ngrams,
           CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           ROUND(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)
                 / CAST(e.n_ngrams AS DOUBLE), 6) AS dup_share
    FROM e JOIN freq f ON e.h = f.h
    GROUP BY e.doc_id, e.n_ngrams
    ORDER BY doc_id
    """,
)
def dup_ngram_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", _shingle_hashes(_DUPGRAM_N).alias("hashes")
    )
    e = d.filter(F.size("hashes") > 0).select(
        "doc_id", F.size("hashes").alias("n_ngrams"), F.explode("hashes").alias("h")
    )
    freq = e.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        e.join(freq, "h")
        .groupBy("doc_id", "n_ngrams")
        .agg(F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"))
        .withColumn(
            "dup_share", F.round(F.col("n_dup") / F.col("n_ngrams").cast("double"), 6)
        )
        .select("doc_id", "n_ngrams", "n_dup", "dup_share")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Context chunking: split each document into fixed-size word windows
# with a per-document chunk ordinal — the step that turns raw documents
# into model-context-sized training units. Pure narrow transformation
# (split -> per-doc sequence explode -> slice); no shuffle at all until
# the final presentation sort.
#
# Scale: each doc expands to ceil(words/CHUNK) rows computed entirely
# within its partition — embarrassingly parallel, output proportional
# to input, no state.
# --------------------------------------------------------------------------
_CHUNK_WORDS = 32


@operator(
    "doc_word_chunks",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    )
    SELECT w.doc_id,
           g.i AS chunk_idx,
           len(list_slice(w.ws, g.i * {_CHUNK_WORDS} + 1,
                                g.i * {_CHUNK_WORDS} + {_CHUNK_WORDS}))
               AS n_words,
           array_to_string(list_slice(w.ws, g.i * {_CHUNK_WORDS} + 1,
                                            g.i * {_CHUNK_WORDS} + {_CHUNK_WORDS}),
                           ' ') AS chunk_text
    FROM w, LATERAL (
      SELECT UNNEST(generate_series(
        0, CAST(CEIL(len(w.ws) / {float(_CHUNK_WORDS)}) AS BIGINT) - 1)) AS i
    ) g
    ORDER BY doc_id, chunk_idx
    """,
)
def doc_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    n_chunks = F.ceil(F.size("ws") / F.lit(float(_CHUNK_WORDS))).cast("long")
    chunked = d.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice(
        "ws", F.col("chunk_idx").cast("int") * _CHUNK_WORDS + 1, _CHUNK_WORDS
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_words"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Inverted index: token -> document frequency + capped, sorted posting
# list — the retrieval-side dual of tfidf_top_term. The cap is enforced
# BEFORE aggregation: a row_number() window over (tok, doc_id) marks the
# first _POSTING_CAP postings per token, and collect_list only sees those
# rows (collect_list skips the NULLs the when() produces for the rest).
# The window sort is spill-able sort-based state, so a stop-word token
# never accumulates an unbounded array in any agg buffer; df still
# counts every row. The window's hash partitioning on tok is reused by
# the groupBy — one exchange total. At 100 TB the full uncapped lists
# would be written sharded by (token, doc_id-bucket), same plan shape
# with a finer key.
# --------------------------------------------------------------------------
_POSTING_CAP = 20
_MIN_DF = 10


@operator(
    "inverted_index",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(list_distinct(string_split(lower(text), ' '))) AS tok
      FROM documents
    )
    SELECT tok,
           COUNT(*) AS df,
           array_to_string(
             list_transform(
               list_slice(list_sort(list(doc_id)), 1, {_POSTING_CAP}),
               x -> CAST(x AS VARCHAR)),
             ',') AS postings
    FROM toks
    WHERE tok <> ''
    GROUP BY tok
    HAVING COUNT(*) >= {_MIN_DF}
    ORDER BY tok
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower("text"), " "))
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    ranked = toks.withColumn("rn", F.row_number().over(w))
    capped_doc = F.when(F.col("rn") <= _POSTING_CAP, F.col("doc_id"))
    postings = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list(capped_doc)),
            lambda x: x.cast("string"),
        ),
    )
    return (
        ranked.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"), postings.alias("postings"))
        .filter(F.col("df") >= _MIN_DF)
        .orderBy("tok")
    )


# --------------------------------------------------------------------------
# Vocabulary coverage: the smallest prefix of the frequency-ranked
# vocabulary that covers _VOCAB_TARGET of all token occurrences — the
# standard pre-tokenizer diagnostic ("how big must the vocab be?").
# The global window runs over the VOCABULARY (|distinct tokens|, tiny
# relative to the corpus), never the corpus itself: the heavy
# reduction (corpus -> per-token counts) is a map-side-combinable agg.
# --------------------------------------------------------------------------
_VOCAB_TARGET = 0.5


@operator(
    "vocab_coverage",
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY tok
    ), ranked AS (
      SELECT tok, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)           AS rnk,
             SUM(cnt) OVER (ORDER BY cnt DESC, tok
                            ROWS UNBOUNDED PRECEDING)             AS cum,
             SUM(cnt) OVER ()                                     AS total
      FROM counts
    )
    SELECT rnk, tok, cnt,
           ROUND(cum / CAST(total AS DOUBLE), 6) AS cum_share
    FROM ranked
    WHERE cum - cnt < {_VOCAB_TARGET} * total
    ORDER BY rnk
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_rank = Window.orderBy(F.col("cnt").desc(), "tok")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = counts.select(
        F.row_number().over(w_rank).alias("rnk"),
        "tok",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    return (
        ranked.filter(
            F.col("cum") - F.col("cnt") < _VOCAB_TARGET * F.col("total")
        )
        .select(
            "rnk",
            "tok",
            "cnt",
            F.round(F.col("cum") / F.col("total").cast("double"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Unigram LM surprisal score (CCNet-style quality signal): train a
# unigram model on the corpus itself, score every doc by its average
# per-token surprisal in bits (high bits/token = unusual vocabulary =
# likely noise; low = repetitive boilerplate). CCNet uses a pretrained
# 5-gram KenLM; the unigram self-model keeps the operator closed over
# the fixture while exercising the identical plan shape (token explode
# → model join → per-doc aggregate).
#
# Scale posture: the model side is a Zipf-bounded vocabulary aggregate
# (≪ corpus; a pretrained vocab is ~MBs) — the model join is left to
# AQE, which broadcasts it when small rather than forcing a hint; the
# per-doc score is one partial-agg shuffle on doc_id. One corpus scan
# for the model, one for the scoring pass.
# --------------------------------------------------------------------------
@operator(
    "lm_surprisal_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS cnt FROM toks GROUP BY w
    ),
    tot AS (SELECT SUM(cnt) AS n FROM vocab)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           -- per-token bits snap onto the 1e6 grid so the per-doc
           -- mean is an exact integer sum divided once (order-free)
           ROUND(SUM(CAST(ROUND(-log2(v.cnt / (SELECT n FROM tot))
                                * 1000000) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6)
               AS bits_per_token
    FROM toks t JOIN vocab v ON v.w = t.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def lm_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    vocab = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    total = vocab.agg(F.sum("cnt").alias("n"))
    model = vocab.join(F.broadcast(total)).select(
        "w",
        F.round(-F.log2(F.col("cnt") / F.col("n")) * 1000000)
        .cast("bigint")
        .alias("bits_g"),
    )
    return (
        toks.join(model, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("bits_g") / (F.count(F.lit(1)) * 1000000.0), 6
            ).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Source-level vocabulary divergence: KL(source || corpus) over unigram
# distributions — the data-mixing diagnostic ("which sources are
# distributionally unusual, and by how much"). Mix-weight tuning and
# domain-upsampling decisions key off exactly this quantity.
#
# Plan: one token explode -> per-(source, token) counts (map-side
# combinable), then two SMALL re-aggregations (per-source totals, the
# global unigram table — vocabulary-sized, not corpus-sized) joined
# back on the token key. The corpus-total scalar rides a broadcast
# crossJoin. At 100 TB the only corpus-scale shuffle is the first
# count; everything after operates on |vocab| x |sources| rows.
# --------------------------------------------------------------------------
@operator(
    "source_vocab_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, tok FROM (
        SELECT source, UNNEST(string_split(lower(text), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    st AS (
      SELECT source, tok, COUNT(*) AS cnt_st FROM toks GROUP BY 1, 2
    ),
    s_tot AS (
      SELECT source, SUM(cnt_st) AS tot_s, COUNT(*) AS vocab
      FROM st GROUP BY 1
    ),
    g AS (SELECT tok, SUM(cnt_st) AS cnt_t FROM st GROUP BY 1),
    tot AS (SELECT SUM(cnt_t) AS tot FROM g)
    SELECT st.source,
           CAST(s_tot.tot_s AS BIGINT) AS n_tokens,
           CAST(s_tot.vocab AS BIGINT) AS vocab,
           ROUND(SUM((st.cnt_st / s_tot.tot_s)
                     * ln((st.cnt_st / s_tot.tot_s)
                          / (g.cnt_t / tot.tot))), 6) AS kl_divergence
    FROM st
    JOIN s_tot ON s_tot.source = st.source
    JOIN g ON g.tok = st.tok
    CROSS JOIN tot
    GROUP BY st.source, s_tot.tot_s, s_tot.vocab
    ORDER BY st.source
    """,
)
def source_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt_st"))
    s_tot = st.groupBy("source").agg(
        F.sum("cnt_st").alias("tot_s"), F.count(F.lit(1)).alias("vocab")
    )
    g = st.groupBy("tok").agg(F.sum("cnt_st").alias("cnt_t"))
    tot = g.agg(F.sum("cnt_t").alias("tot"))
    p = F.col("cnt_st") / F.col("tot_s")
    q = F.col("cnt_t") / F.col("tot")
    return (
        st.join(F.broadcast(s_tot), "source")
        .join(g, "tok")
        .crossJoin(F.broadcast(tot))
        .withColumn("term", p * F.log(p / q))
        .groupBy("source", "tot_s", "vocab")
        .agg(F.round(F.sum("term"), 6).alias("kl_divergence"))
        .select(
            "source",
            F.col("tot_s").cast("bigint").alias("n_tokens"),
            F.col("vocab").cast("bigint").alias("vocab"),
            "kl_divergence",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Hashing-trick vectorizer (feature hashing): tokens hashed into a
# fixed 64-bucket space via the corpus-standard md5-prefix hash (same
# deterministic hash family as the minhash/shard operators — exactly
# reproducible in any engine, unlike murmur3 whose seeds differ).
# Emits the per-document sparse-vector summary (token count, nonzero
# buckets, L2 norm of the count vector) — the fixed-width featurization
# that feeds linear quality classifiers at corpus scale. One explode +
# two keyed aggs, both map-side combinable; no vocabulary state at all
# (that is the point of the hashing trick).
# --------------------------------------------------------------------------
_FH_BUCKETS = 64


@operator(
    "token_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    bucketed AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % {_FH_BUCKETS}
               AS bucket
      FROM toks
    ),
    counts AS (
      SELECT doc_id, bucket, COUNT(*) AS cnt
      FROM bucketed GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*)                 AS nnz,
           ROUND(sqrt(SUM(cnt * cnt)), 6) AS l2_norm
    FROM counts GROUP BY doc_id ORDER BY doc_id
    """,
)
def token_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
        % _FH_BUCKETS
    )
    counts = (
        toks.withColumn("bucket", bucket)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("nnz"),
            F.round(F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))), 6).alias(
                "l2_norm"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Character-level Shannon entropy per document — the intra-document
# randomness quality signal (low entropy = repetitive/boilerplate,
# high = random noise; both ends get filtered in corpus curation).
# Complements `lm_surprisal_score` (cross-entropy vs the corpus
# unigram LM) and `repetition_ratio`. One char explode -> per-(doc,
# char) counts -> per-doc fold; the char alphabet is tiny so the
# second agg is |docs| x |alphabet|.
# --------------------------------------------------------------------------
@operator(
    "doc_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, UNNEST(string_split(text, '')) AS ch
      FROM documents
    ),
    cc AS (
      SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY 1, 2
    ),
    n AS (SELECT doc_id, SUM(cnt) AS n FROM cc GROUP BY doc_id)
    SELECT cc.doc_id,
           CAST(MAX(n.n) AS BIGINT) AS n_chars_counted,
           COUNT(*) AS alphabet,
           ROUND(-SUM((cc.cnt / CAST(n.n AS DOUBLE))
                      * log2(cc.cnt / CAST(n.n AS DOUBLE))), 6)
             AS entropy_bits
    FROM cc JOIN n ON n.doc_id = cc.doc_id
    GROUP BY cc.doc_id
    ORDER BY cc.doc_id
    """,
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    chars = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    cc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    n = cc.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n").cast("double")
    return (
        cc.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars_counted"),
            F.count(F.lit(1)).alias("alphabet"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BPE merge-candidate counts: the frequency of every ADJACENT token
# pair across the corpus — the inner loop of byte-pair-encoding vocab
# training (each merge round picks the most frequent adjacent pair).
# Not in the reference (batch surface is keyed aggregates,
# /root/reference/doc/temp.md:509-530); north-star tokenizer scope
# (SURVEY.md §2.8). Implemented as an in-JVM zip of each token array
# with its own tail (arrays_zip over slice — no posexplode self-join),
# then one grouped count: the map side pre-aggregates, the shuffle
# carries (pair, partial count), and the pair domain — not the corpus
# — bounds the final state. Top pairs with (count desc, pair) total
# order.
# --------------------------------------------------------------------------
_BPE_TOPK = 50


@operator(
    "bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens('text')} AS t FROM documents
    ),
    pairs AS (
      SELECT t[i] AS left_tok, t[i + 1] AS right_tok
      FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM toks)
    )
    SELECT left_tok, right_tok, COUNT(*) AS cnt
    FROM pairs
    GROUP BY 1, 2
    ORDER BY cnt DESC, left_tok, right_tok
    LIMIT {_BPE_TOPK}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(tokens("text").alias("t"))
    zipped = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(
        F.col("p")["0"].alias("left_tok"), F.col("p")["1"].alias("right_tok")
    )
    return (
        zipped.groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "left_tok", "right_tok")
        .limit(_BPE_TOPK)
    )


# --------------------------------------------------------------------------
# Round-5 text additions: tokenizer economics, a smoothed bigram LM,
# containment-style near-dup detection, a lang-id confusion census,
# MOSS-style winnowing fingerprints, and template-prefix clustering.
# --------------------------------------------------------------------------
@operator(
    "tokenizer_compression_ratio",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(SUM(length(text)) AS BIGINT)        AS sum_chars,
           CAST(SUM(strlen(text)) AS BIGINT)        AS sum_bytes,
           CAST(SUM(len({sql_tokens('text')})) AS BIGINT) AS sum_tokens,
           ROUND(SUM(length(text))
                 / CAST(SUM(len({sql_tokens('text')})) AS DOUBLE), 6)
                                                    AS chars_per_token,
           ROUND(SUM(strlen(text))
                 / CAST(SUM(length(text)) AS DOUBLE), 6) AS bytes_per_char
    FROM documents GROUP BY 1 ORDER BY lang
    """,
)
def tokenizer_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer economics per language: characters and bytes per
    token — the fertility numbers a pretraining-budget planner needs
    before fixing a tokenizer. Exact integer sums, two divisions per
    language."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
            F.sum(F.octet_length("text")).cast("bigint").alias("sum_bytes"),
            F.sum(F.size(tokens("text"))).cast("bigint").alias("sum_tokens"),
            F.round(
                F.sum(F.length("text"))
                / F.sum(F.size(tokens("text"))).cast("double"),
                6,
            ).alias("chars_per_token"),
            F.round(
                F.sum(F.octet_length("text"))
                / F.sum(F.length("text")).cast("double"),
                6,
            ).alias("bytes_per_char"),
        )
        .orderBy("lang")
    )


@operator(
    "bigram_lm_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
      FROM (
        SELECT doc_id,
               UNNEST({sql_tokens('text')}) AS tok,
               UNNEST(range(len({sql_tokens('text')}))) AS pos
        FROM documents
      )
    ),
    bigrams AS (
      SELECT doc_id,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             tok AS w2
      FROM toks
      QUALIFY w1 IS NOT NULL
    ),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n2
           FROM bigrams GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1
           FROM bigrams GROUP BY 1),
    v  AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsz FROM toks)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           -- per-bigram logprobs snap onto the 1e6 grid: the per-doc
           -- mean is an exact integer sum divided once (order-free)
           ROUND(SUM(CAST(ROUND(ln((c2.n2 + 1)
                                    / CAST(c1.n1 + v.vsz AS DOUBLE))
                                * 1000000) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6)
                                    AS avg_logprob
    FROM bigrams b
    JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
    JOIN c1 ON c1.w1 = b.w1
    CROSS JOIN v
    WHERE b.doc_id < 100
    GROUP BY 1 ORDER BY doc_id
    """,
)
def bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram language model trained on the corpus,
    scoring each document's mean bigram log-probability — the
    surprisal signal used to flag incoherent / boilerplate text
    (unigram twin: `lm_surprisal_score`). Counts are exact integers;
    one ln per distinct bigram. Count tables shuffle on the bigram
    key; the per-doc score re-joins on the same key (broadcast-sized
    here, AQE picks the strategy at scale)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.select("doc_id", F.lag("tok").over(w).alias("w1"),
                    F.col("tok").alias("w2"))
        .filter(F.col("w1").isNotNull())
    )
    c2 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    v = toks.agg(F.count_distinct("tok").alias("vsz"))
    lp_g = F.round(
        F.log((F.col("n2") + 1) / (F.col("n1") + F.col("vsz")).cast("double"))
        * 1000000
    ).cast("bigint")
    return (
        bigrams.filter(F.col("doc_id") < 100)
        .join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(lp_g) / (F.count(F.lit(1)) * 1000000.0), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_CONT_DF_CAP = 50   # ignore shingles present in more than this many docs
_CONT_MIN = 0.5


@operator(
    "ngram_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             {sql_token_hash("array_to_string(toks[i:i+2], ' ')")} AS h
      FROM (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
      ), UNNEST(range(1, len(toks) - 1)) AS u(i)
    ),
    disc AS (
      SELECT doc_id, h FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY h) <= {_CONT_DF_CAP}
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
              FROM disc GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM disc a JOIN disc b ON a.h = b.h AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.inter,
           s.sz AS size_a,
           ROUND(i.inter / CAST(s.sz AS DOUBLE), 6) AS containment
    FROM inter i JOIN sizes s ON s.doc_id = i.doc_a
    WHERE i.inter / CAST(s.sz AS DOUBLE) >= {_CONT_MIN}
    ORDER BY doc_a, doc_b
    """,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection C(A,B) = |A∩B| / |A| over
    discriminative trigram shingles (corpus-wide document frequency
    <= _CONT_DF_CAP; ubiquitous shingles carry no identity signal and
    would otherwise quadratically inflate the shingle join). Unlike
    Jaccard (`jaccard_pairs`), containment is ASYMMETRIC — it catches
    a document embedded inside a larger one. The pair enumeration is
    the shingle-bucket join bounded by the df cap: Σ df² per shingle,
    never |docs|²."""
    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    return containment_pairs_frame(d)


def containment_pairs_frame(d: DataFrame) -> DataFrame:
    """Production core of `ngram_containment_pairs` over a
    (doc_id, toks) frame — exposed so the subset-identity property
    (A == B -> C = 1 both ways; A ⊂ B -> C(A,B) = 1, C(B,A) < 1) is
    testable on planted corpora."""
    # guard: sequence(0, n) DESCENDS when n < 0, so short docs must be
    # filtered before the shingle expansion (oracle's range() is empty
    # there)
    grams = d.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.array_join(F.slice("toks", i + 1, 3), " "),
            )
        ).alias("g"),
    )
    sh = grams.select(
        "doc_id", (token_hash("g")).alias("h")
    ).distinct()
    wdf = Window.partitionBy("h")
    disc = sh.withColumn("df", F.count(F.lit(1)).over(wdf)).filter(
        F.col("df") <= _CONT_DF_CAP
    ).select("doc_id", "h")
    sizes = disc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = disc.select(F.col("doc_id").alias("doc_a"), "h")
    b = disc.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes, inter.doc_a == sizes.doc_id)
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("bigint").alias("inter"),
            F.col("sz").cast("bigint").alias("size_a"),
            F.round(F.col("inter") / F.col("sz").cast("double"), 6).alias(
                "containment"
            ),
        )
        .filter(
            F.col("inter") / F.col("sz").cast("double") >= _CONT_MIN
        )
        .orderBy("doc_a", "doc_b")
    )


def _register_lang_confusion() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH pred AS ({ORACLES["lang_id"]})
    SELECT d.lang AS true_lang,
           p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2 ORDER BY true_lang, pred_lang
    """

    @operator("lang_confusion_matrix", oracle=oracle)
    def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Confusion census of the n-gram lang-id heuristic against the
        stored language labels — the eval table that decides whether a
        heuristic is good enough to route documents at scale. Composes
        the registered `lang_id` plan; one broadcast join + bounded
        (langs x langs) agg."""
        pred = REGISTRY["lang_id"](spark, sf_dir)
        d = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("true_lang"))
        return (
            d.join(pred, "doc_id")
            .groupBy("true_lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("true_lang", "pred_lang")
        )


_register_lang_confusion()


