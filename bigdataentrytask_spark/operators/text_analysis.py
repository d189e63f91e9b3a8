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
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
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


_WIN_K = 3  # shingle width (tokens)
_WIN_W = 4  # winnowing window (shingles)


def winnow_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, pos, h): positional k-gram shingle hashes of a
    (doc_id, toks) frame — the winnowing input sequence."""
    # same short-doc guard as ngram_containment_pairs (descending
    # sequence() below _WIN_K tokens)
    return d.filter(F.size("toks") >= _WIN_K).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - _WIN_K),
                lambda i: F.array_join(F.slice("toks", i + 1, _WIN_K), " "),
            )
        ).alias("pos", "g"),
    ).select("doc_id", "pos", token_hash("g").alias("h"))


def winnow_fingerprint_frame(d: DataFrame) -> DataFrame:
    """(doc_id, wmin) distinct winnowing fingerprints of a
    (doc_id, toks) frame — the production core of
    `winnowing_fingerprints`, exposed so the guarantee property
    (any shared run of >= _WIN_W + _WIN_K - 1 tokens shares a
    fingerprint) is testable on planted-duplicate corpora."""
    sh = winnow_shingles(d)
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wins = sh.select(
        "doc_id",
        F.min("h").over(w).alias("wmin"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    return wins.filter(F.col("wn") == _WIN_W).select("doc_id", "wmin").distinct()


@operator(
    "winnowing_fingerprints",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, i AS pos,
             {sql_token_hash("array_to_string(toks[i:i+2], ' ')")} AS h
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
           UNNEST(range(1, len(toks) - 1)) AS u(i)
    ),
    wins AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS wmin,
             COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS wn
      FROM sh
    ),
    fps AS (
      SELECT DISTINCT doc_id, wmin FROM wins WHERE wn = {_WIN_W}
    )
    SELECT s.doc_id,
           CAST(COUNT(DISTINCT s.h) AS BIGINT)  AS n_shingles,
           CAST(MAX(f.nf) AS BIGINT)            AS n_fingerprints
    FROM sh s
    JOIN (SELECT doc_id, COUNT(*) AS nf FROM fps GROUP BY 1) f
      ON f.doc_id = s.doc_id
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing (Schleimer et al., SIGMOD 2003): slide a
    w-shingle window over each document's k-gram hash sequence and
    keep each window's MINIMUM hash — a position-robust fingerprint
    set whose size is ~2/(w+1) of the shingle count, with a guarantee
    that any match of length >= w+k-1 shares a fingerprint. Per-doc
    ROWS windows only; the fingerprint table is the dedup index a
    plagiarism / near-dup service builds at corpus scale."""
    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    sh = winnow_shingles(d)
    fps = (
        winnow_fingerprint_frame(d)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nf"))
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.count_distinct("h").alias("n_shingles")
    )
    return (
        per_doc.join(fps, "doc_id")
        .select(
            "doc_id",
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("nf").cast("bigint").alias("n_fingerprints"),
        )
        .orderBy("doc_id")
    )


_TPL_PREFIX = 5


@operator(
    "template_prefix_clusters",
    oracle=f"""
    WITH pre AS (
      SELECT doc_id,
             array_to_string(({sql_tokens('text')})[1:{_TPL_PREFIX}], ' ')
               AS prefix
      FROM documents
      WHERE len({sql_tokens('text')}) >= {_TPL_PREFIX}
    )
    SELECT prefix,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM pre GROUP BY 1
    HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, prefix
    """,
)
def template_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection: documents sharing an identical
    leading-token prefix (headers, scraped templates, licence
    preambles). One hash agg on the prefix string — the cheap first
    pass before the expensive shingle-based dedup runs."""
    d = _docs(spark, sf_dir).select("doc_id", tokens("text").alias("toks"))
    pre = d.filter(F.size("toks") >= _TPL_PREFIX).select(
        "doc_id",
        F.array_join(F.slice("toks", 1, _TPL_PREFIX), " ").alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix")
    )


@operator(
    "doc_length_outliers",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({sql_tokens('text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT)              AS n,
             CAST(SUM(n_tokens) AS BIGINT)         AS sx,
             CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS sxx
      FROM t GROUP BY 1
    )
    SELECT t.doc_id, t.source, t.n_tokens,
           ROUND((t.n_tokens - sx / CAST(n AS DOUBLE))
                 / sqrt(sxx / CAST(n AS DOUBLE)
                        - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))),
                 4) AS z
    FROM t JOIN s ON s.source = t.source
    WHERE ABS((t.n_tokens - sx / CAST(n AS DOUBLE))
              / sqrt(sxx / CAST(n AS DOUBLE)
                     - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))))
          > 2.0
    ORDER BY doc_id
    """,
)
def doc_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length z-score outliers (|z| > 2) — the
    truncation/concatenation-artifact detector of a curation
    pipeline. Moments from exact integer sums (population std), one
    broadcast join of the per-source moment table."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("sx"),
        F.sum(F.col("n_tokens") * F.col("n_tokens")).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n").cast("double")
    std = F.sqrt(F.col("sxx") / F.col("n").cast("double") - mean * mean)
    z = (F.col("n_tokens") - mean) / std
    return (
        d.join(F.broadcast(s), "source")
        .withColumn("z", F.round(z, 4))
        .filter(F.abs((F.col("n_tokens") - mean) / std) > 2.0)
        .select("doc_id", "source", "n_tokens", "z")
        .orderBy("doc_id")
    )


_PMI_MIN_PAIRS = 5


@operator(
    "keyword_cooccurrence_pmi",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, UNNEST({sql_tokens('text')}) AS tok
            FROM documents)
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM dt),
    df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM dt GROUP BY 1),
    pairs AS (
      SELECT a.tok AS t1, b.tok AS t2, CAST(COUNT(*) AS BIGINT) AS cxy
      FROM dt a JOIN dt b
        ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_PMI_MIN_PAIRS}
    )
    SELECT p.t1, p.t2, p.cxy,
           ROUND(ln(p.cxy * n.nd / CAST(d1.c * d2.c AS DOUBLE)), 6) AS pmi
    FROM pairs p
    JOIN df d1 ON d1.tok = p.t1
    JOIN df d2 ON d2.tok = p.t2
    CROSS JOIN n
    ORDER BY pmi DESC, t1, t2 LIMIT 20
    """,
)
def keyword_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a
    document (document-level PMI, top associations) — the collocation
    signal topic/phrase mining starts from. Pair expansion is the
    per-doc distinct-token self-join: Σ (distinct tokens per doc)²,
    the basket-expansion bound again (docs here are ~30 distinct
    tokens). All counts exact; one ln per surviving pair."""
    d = _docs(spark, sf_dir)
    dt = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).distinct()
    nd = dt.agg(F.count_distinct("doc_id").alias("nd"))
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    a = dt.select("doc_id", F.col("tok").alias("t1"))
    b = dt.select("doc_id", F.col("tok").alias("t2"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MIN_PAIRS)
    )
    d1 = df.select(F.col("tok").alias("t1"), F.col("c").alias("c1"))
    d2 = df.select(F.col("tok").alias("t2"), F.col("c").alias("c2"))
    pmi = F.log(
        F.col("cxy") * F.col("nd") / (F.col("c1") * F.col("c2")).cast("double")
    )
    return (
        pairs.join(d1, "t1")
        .join(d2, "t2")
        .crossJoin(F.broadcast(nd))
        .select("t1", "t2", "cxy", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "t1", "t2")
        .limit(20)
    )


def _register_curation_compositions() -> None:
    # the composed oracles read ORACLES entries owned by dedup.py and
    # similarity.py — import them first so text_analysis stays safely
    # importable STANDALONE (no hidden load_all() ordering coupling;
    # both modules are cycle-free w.r.t. this one)
    from bigdataentrytask_spark.operators import (  # noqa: F401
        dedup,
        similarity,
    )
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    # ---- dedup rate by source: where do the duplicates come from? ----
    oracle = f"""
    WITH fps AS (
      SELECT doc_id, source, md5({sql_normalize_text('text')}) AS fp
      FROM documents
    ),
    keep AS (
      SELECT fp, MIN(doc_id) AS keeper FROM fps GROUP BY 1
    )
    SELECT f.source,
           CAST(COUNT(*) AS BIGINT)                            AS n_docs,
           CAST(COUNT(*) FILTER (WHERE f.doc_id <> k.keeper) AS BIGINT)
                                                               AS n_dropped,
           ROUND(COUNT(*) FILTER (WHERE f.doc_id <> k.keeper)
                 / CAST(COUNT(*) AS DOUBLE), 6)                AS drop_rate
    FROM fps f JOIN keep k ON k.fp = f.fp
    GROUP BY 1 ORDER BY source
    """

    @operator("dedup_rate_by_source", oracle=oracle)
    def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact-duplicate drop rate per source (keeper = min doc_id
        per fingerprint — the `dedup_exact` contract) — the
        provenance table that tells a curation team WHICH feed ships
        the duplication. One fingerprint agg + one keyed join."""
        d = _docs(spark, sf_dir).select(
            "doc_id", "source", normalize_text("text").alias("norm")
        ).withColumn("fp", F.md5("norm"))
        keep = d.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
        j = d.join(keep, "fp")
        dropped = (F.col("doc_id") != F.col("keeper")).cast("bigint")
        return (
            j.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(dropped).cast("bigint").alias("n_dropped"),
                F.round(
                    F.sum(dropped) / F.count(F.lit(1)).cast("double"), 6
                ).alias("drop_rate"),
            )
            .orderBy("source")
        )

    # ---- LM-score quality filter: keep/drop census by language ----
    oracle = f"""
    WITH scored AS ({ORACLES["bigram_lm_logprob"]})
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT)                           AS n_scored,
           CAST(COUNT(*) FILTER (WHERE s.avg_logprob >= -7.0) AS BIGINT)
                                                              AS n_keep,
           ROUND(MIN(s.avg_logprob), 6)                       AS worst,
           ROUND(MAX(s.avg_logprob), 6)                       AS best
    FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    GROUP BY 1 ORDER BY lang
    """

    @operator("perplexity_filter_census", oracle=oracle)
    def perplexity_filter_census(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """LM-likelihood quality gate (the CCNet/KenLM pattern: drop
        text the corpus LM finds surprising) — keep/drop census per
        language at a fixed mean-bigram-logprob threshold. Composes
        the verified `bigram_lm_logprob` plan; the filter itself is
        one predicate over the scored frame."""
        scored = REGISTRY["bigram_lm_logprob"](spark, sf_dir)
        d = _docs(spark, sf_dir).select("doc_id", "lang")
        j = scored.join(d, "doc_id")
        keep = (F.col("avg_logprob") >= -7.0).cast("bigint")
        return (
            j.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_scored"),
                F.sum(keep).cast("bigint").alias("n_keep"),
                F.round(F.min("avg_logprob"), 6).alias("worst"),
                F.round(F.max("avg_logprob"), 6).alias("best"),
            )
            .orderBy("lang")
        )

    # ---- end-to-end dedup funnel: exact -> minhash -> semantic ----
    oracle = f"""
    WITH exact AS ({ORACLES["dedup_exact"]}),
    mh AS ({ORACLES["minhash_dedup"]}),
    sem AS ({ORACLES["semdedup_resolve"]})
    SELECT 'stage1_exact' AS stage,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT)   AS n_in,
           CAST((SELECT COUNT(*) FROM exact) AS BIGINT)       AS n_out
    UNION ALL
    SELECT 'stage2_minhash_pairs',
           CAST((SELECT COUNT(*) FROM exact) AS BIGINT),
           CAST((SELECT COUNT(*) FROM mh) AS BIGINT)
    UNION ALL
    SELECT 'stage3_semantic_keepers',
           CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT),
           CAST((SELECT COUNT(*) FILTER (WHERE keep) FROM sem) AS BIGINT)
    ORDER BY stage
    """

    @operator("dedup_pipeline_funnel", oracle=oracle)
    def dedup_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The three-stage dedup funnel a production corpus runs —
        exact fingerprints, MinHash/LSH near-dup pairs, semantic
        (embedding) keeper resolution — summarized as one
        stage/in/out table. Each stage is the REGISTERED, verified
        operator; this entry pins their composition so a regression
        in any stage moves the funnel."""
        from pyspark.sql import Row

        exact_n = REGISTRY["dedup_exact"](spark, sf_dir).count()
        docs_n = _docs(spark, sf_dir).count()
        mh_n = REGISTRY["minhash_dedup"](spark, sf_dir).count()
        sem = REGISTRY["semdedup_resolve"](spark, sf_dir)
        emb_n = sem.count()
        sem_keep = sem.filter(F.col("keep")).count()
        rows = [
            Row(stage="stage1_exact", n_in=docs_n, n_out=exact_n),
            Row(stage="stage2_minhash_pairs", n_in=exact_n, n_out=mh_n),
            Row(
                stage="stage3_semantic_keepers",
                n_in=emb_n,
                n_out=sem_keep,
            ),
        ]
        return spark.createDataFrame(rows).orderBy("stage")


_register_curation_compositions()


@operator(
    "source_char_bigram_entropy",
    oracle="""
    WITH grams AS (
      SELECT source, substr(text, i, 2) AS g
      FROM documents, UNNEST(range(1, length(text))) AS u(i)
    ),
    counts AS (
      SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM grams GROUP BY 1, 2
    ),
    tot AS (
      SELECT source, SUM(c) AS n, COUNT(*) AS n_grams
      FROM counts GROUP BY 1
    )
    SELECT c.source,
           CAST(MAX(t.n) AS BIGINT)       AS n_bigrams,
           CAST(MAX(t.n_grams) AS BIGINT) AS n_distinct,
           ROUND(-SUM((c.c / CAST(t.n AS DOUBLE))
                      * ln(c.c / CAST(t.n AS DOUBLE))), 6) AS entropy
    FROM counts c JOIN tot t ON t.source = c.source
    GROUP BY c.source ORDER BY c.source
    """,
)
def source_char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram entropy per source — the compressibility /
    gibberish proxy (low entropy = template spam, high = encrypted or
    random junk) that costs one pass, unlike running an actual
    compressor. Bigram expansion is an in-JVM transform over char
    positions (linear in corpus bytes); probabilities from exact
    counts, one ln per distinct bigram."""
    d = _docs(spark, sf_dir)
    # short-text guard (CONTRIBUTING pitfall: sequence() descends when
    # its stop < start, so a 0/1-char doc would emit phantom grams
    # where the oracle's range() is empty)
    grams = d.filter(F.length("text") >= 2).select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("g"),
    )
    counts = grams.groupBy("source", "g").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_grams")
    )
    j = counts.join(tot, "source")
    p = F.col("c") / F.col("n").cast("double")
    return (
        j.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_bigrams"),
            F.max("n_grams").cast("bigint").alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Shingle document-frequency distribution (round 7): the sizing
# diagnostic BEHIND the df-cap that ngram_containment_pairs depends
# on. Buckets the corpus's distinct trigram shingles by how many
# documents each appears in; the head buckets (df=1) carry identity
# signal, the tail (df>10) is the stop-shingle mass a containment
# join must cap away (its join cost is Σ df²). One explode + one
# grouped count on the shingle hash + one 5-key rollup — exactly the
# plan that runs before choosing _CONT_DF_CAP at 100 TB.
# --------------------------------------------------------------------------
_SDF_N = 3


@operator(
    "shingle_df_distribution",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_sql_shingle_hashes(_SDF_N)} AS hashes
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    df AS (
      SELECT u.h, CAST(COUNT(*) AS BIGINT) AS df
      FROM g, UNNEST(g.hashes) AS u(h) GROUP BY u.h
    )
    SELECT CASE WHEN df = 1 THEN 'a_unique'
                WHEN df = 2 THEN 'b_df2'
                WHEN df <= 5 THEN 'c_df3_5'
                WHEN df <= 10 THEN 'd_df6_10'
                ELSE 'e_df11_plus' END            AS df_bucket,
           CAST(COUNT(*) AS BIGINT)               AS n_shingles,
           CAST(SUM(df) AS BIGINT)                AS occurrence_mass,
           CAST(SUM(CAST(df AS HUGEINT) * df) AS BIGINT) AS join_cost_df2
    FROM df GROUP BY 1 ORDER BY df_bucket
    """,
)
def shingle_df_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    g = d.select("doc_id", _shingle_hashes(_SDF_N).alias("hashes"))
    df = (
        g.select(F.explode("hashes").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    bucket = (
        F.when(F.col("df") == 1, "a_unique")
        .when(F.col("df") == 2, "b_df2")
        .when(F.col("df") <= 5, "c_df3_5")
        .when(F.col("df") <= 10, "d_df6_10")
        .otherwise("e_df11_plus")
    )
    dec = F.col("df").cast("decimal(38,0)")
    return (
        df.groupBy(bucket.alias("df_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").cast("bigint").alias("occurrence_mass"),
            F.sum(dec * F.col("df")).cast("bigint").alias("join_cost_df2"),
        )
        .orderBy("df_bucket")
    )


# --------------------------------------------------------------------------
# Lexicon hit rate per source: docs containing any lexicon token and
# hits per 1000 tokens — the blocklist/topic-lexicon screen shape
# (the real list would be domain terms, unsafe-content terms, or a
# compliance blocklist; the mechanics are identical). The lexicon is
# a literal array (broadcast by construction); per-row math is pure
# codegen; one shuffle on |sources| keys.
# --------------------------------------------------------------------------
_LEXICON = ["spark", "stream", "merge", "join"]


@operator(
    "lexicon_hit_rate",
    oracle=f"""
    WITH t AS (
      SELECT source, {sql_tokens('text')} AS toks FROM documents
    ), h AS (
      SELECT source,
             len(toks) AS n_toks,
             len(list_filter(toks, x -> x IN
                 ({", ".join(repr(w) for w in _LEXICON)}))) AS hits
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)               AS n_docs,
           CAST(count_if(hits > 0) AS BIGINT)     AS docs_with_hit,
           CAST(SUM(hits) AS BIGINT)              AS total_hits,
           ROUND(SUM(hits) * 1000.0 / SUM(n_toks), 6) AS hits_per_1k_tokens
    FROM h GROUP BY source ORDER BY source
    """,
)
def lexicon_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = tokens("text")
    lex = F.array(*[F.lit(w) for w in _LEXICON])
    # count occurrences (array_intersect would dedup and undercount)
    hits = F.size(F.filter(toks, lambda x: F.array_contains(lex, x)))
    h = d.select(
        "source", F.size(toks).alias("n_toks"), hits.alias("hits")
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("hits") > 0, 1)).alias("docs_with_hit"),
            F.sum("hits").cast("bigint").alias("total_hits"),
            F.round(
                F.sum("hits") * 1000.0 / F.sum("n_toks"), 6
            ).alias("hits_per_1k_tokens"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Dataset datacard: the CUBE over (source, lang) a corpus release
# ships with — every marginal and the grand total in one pass
# (grouping-set aggregation shuffles each input row once per
# grouping, all map-side combinable; the flags disambiguate NULL
# group values from NULL-as-total).
# --------------------------------------------------------------------------
@operator(
    "corpus_datacard_summary",
    oracle=f"""
    SELECT source, lang,
           GROUPING(source) AS g_source,
           GROUPING(lang)   AS g_lang,
           CAST(COUNT(*) AS BIGINT)          AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)      AS total_chars,
           CAST(SUM(len({sql_tokens('text')})) AS BIGINT) AS total_tokens,
           ROUND(SUM(len({sql_tokens('text')}))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_tokens
    FROM documents
    GROUP BY CUBE (source, lang)
    ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST
    """,
)
def corpus_datacard_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_toks = F.size(tokens("text"))
    return (
        d.select("source", "lang", "n_chars", n_toks.alias("n_toks"))
        .cube("source", "lang")
        .agg(
            F.grouping("source").alias("g_source"),
            F.grouping("lang").alias("g_lang"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum("n_toks") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_tokens"),
        )
        .orderBy(
            "g_source",
            "g_lang",
            F.col("source").asc_nulls_first(),
            F.col("lang").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth fit (round-8 slate): V(n) ~ K * n^beta
# where V(n) = distinct vocabulary after the first n tokens of the
# corpus (doc_id order). The scalable trick: V at each checkpoint is
# "tokens whose FIRST occurrence falls at or before the checkpoint"
# — one min(first-position) per token, then a count per checkpoint;
# no sequential scan, no per-prefix distinct. beta/K by log-log OLS
# over the checkpoints. Corpus position comes from the running token
# count over doc_id order (a window over the |docs| aggregate, not
# the token stream).
# --------------------------------------------------------------------------
_HEAPS_CHECKPOINTS = [10, 25, 50, 75, 100]  # percent of docs


@operator(
    "heaps_law_fit",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    firsts AS (
      SELECT u.tok, MIN(doc_id) AS first_doc
      FROM docs, UNNEST(docs.toks) AS u(tok)
      GROUP BY u.tok
    ),
    doc_sizes AS (
      SELECT doc_id, len(toks) AS n_toks,
             SUM(len(toks)) OVER (ORDER BY doc_id) AS cum_toks
      FROM docs
    ),
    marks AS (
      SELECT UNNEST([{", ".join(str(p) for p in _HEAPS_CHECKPOINTS)}]) AS p,
             UNNEST((SELECT quantile_disc(doc_id,
                       [{", ".join(str(p / 100.0) for p in _HEAPS_CHECKPOINTS)}])
                     FROM doc_sizes))::BIGINT AS cut_doc
    ),
    points AS (
      SELECT m.p,
             (SELECT CAST(MAX(cum_toks) AS BIGINT) FROM doc_sizes
              WHERE doc_id <= m.cut_doc)                  AS n_tokens,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
              WHERE first_doc <= m.cut_doc)               AS vocab
      FROM marks m
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_pts,
             SUM(ln(n_tokens))                 AS sx,
             SUM(ln(vocab))                    AS sy,
             SUM(ln(n_tokens) * ln(n_tokens))  AS sxx,
             SUM(ln(n_tokens) * ln(vocab))     AS sxy
      FROM points
    )
    SELECT p, n_tokens, vocab,
           ROUND((f.k_pts * f.sxy - f.sx * f.sy)
                 / (f.k_pts * f.sxx - f.sx * f.sx), 6) AS heaps_beta,
           ROUND(exp((f.sy - (f.k_pts * f.sxy - f.sx * f.sy)
                      / (f.k_pts * f.sxx - f.sx * f.sx) * f.sx)
                     / f.k_pts), 6)                    AS heaps_k
    FROM points CROSS JOIN fit f
    ORDER BY p
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    docs = d.select("doc_id", tokens("text").alias("toks"))
    firsts = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    w = Window.orderBy("doc_id")
    doc_sizes = docs.select(
        "doc_id", F.size("toks").alias("n_toks")
    ).withColumn("cum_toks", F.sum("n_toks").over(w))
    marks = doc_sizes.agg(
        *[
            F.expr(f"percentile_disc({p / 100.0}) WITHIN GROUP (ORDER BY doc_id)")
            .cast("bigint")
            .alias(f"cut_{p}")
            for p in _HEAPS_CHECKPOINTS
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"), F.col(f"cut_{p}").alias("cut_doc")
                    )
                    for p in _HEAPS_CHECKPOINTS
                ]
            )
        ).alias("m")
    ).select("m.p", "m.cut_doc")
    points = (
        marks.join(
            doc_sizes.select("doc_id", "cum_toks"),
            doc_sizes.doc_id <= F.col("cut_doc"),
        )
        .groupBy("p", "cut_doc")
        .agg(F.max("cum_toks").cast("bigint").alias("n_tokens"))
        .join(
            marks.join(
                firsts, firsts.first_doc <= F.col("cut_doc"), "left"
            )
            .groupBy("p")
            .agg(F.count("tok").cast("bigint").alias("vocab")),
            "p",
        )
        .select("p", "n_tokens", "vocab")
    )
    lx = F.log("n_tokens")
    ly = F.log("vocab")
    fit = points.agg(
        F.count(F.lit(1)).alias("k_pts"),
        F.sum(lx).alias("sx"),
        F.sum(ly).alias("sy"),
        F.sum(lx * lx).alias("sxx"),
        F.sum(lx * ly).alias("sxy"),
    )
    beta = (F.col("k_pts") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k_pts") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    k = F.exp((F.col("sy") - beta * F.col("sx")) / F.col("k_pts"))
    return (
        points.crossJoin(F.broadcast(fit))
        .select(
            "p",
            "n_tokens",
            "vocab",
            F.round(beta, 6).alias("heaps_beta"),
            F.round(k, 6).alias("heaps_k"),
        )
        .orderBy("p")
    )


# --------------------------------------------------------------------------
# N-gram novelty curve over ingestion batches (round-8 slate): split
# the corpus into doc_id-ordered batches of 100 and measure, per
# batch, the fraction of its distinct 3-gram hashes never seen in any
# EARLIER batch. The time-axis companion to heaps_law_fit (which
# grows vocabulary over corpus SIZE): a crawl whose novelty rate
# collapses is re-crawling itself — the signal that tells a pipeline
# to stop paying for a source. First occurrence = min(batch) per
# hash: one grouped pass over the exploded shingles, no sequential
# scan, so the curve is a plain keyed aggregation at 100 TB.
# --------------------------------------------------------------------------
@operator(
    "ngram_novelty_curve",
    oracle=f"""
    WITH g AS (
      SELECT doc_id // 100 AS batch, {_sql_shingle_hashes(_DUPGRAM_N)} AS hashes
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    e AS (
      SELECT DISTINCT batch, u.h FROM g, UNNEST(g.hashes) AS u(h)
    ),
    firsts AS (SELECT h, CAST(MIN(batch) AS BIGINT) AS fb FROM e GROUP BY h),
    per AS (
      SELECT e.batch,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_ngrams,
             CAST(count_if(f.fb = e.batch) AS BIGINT) AS n_novel
      FROM e JOIN firsts f ON f.h = e.h
      GROUP BY 1
    )
    SELECT CAST(batch AS BIGINT) AS batch, n_distinct_ngrams, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_distinct_ngrams, 6)
             AS novelty_rate
    FROM per ORDER BY batch
    """,
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        F.expr("doc_id div 100").alias("batch"),
        _shingle_hashes(_DUPGRAM_N).alias("hashes"),
    )
    e = (
        d.select("batch", F.explode("hashes").alias("h"))
        .distinct()
    )
    firsts = e.groupBy("h").agg(F.min("batch").cast("bigint").alias("fb"))
    per = (
        e.join(firsts, "h")
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_ngrams"),
            F.sum(F.when(F.col("fb") == F.col("batch"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per.select(
        F.col("batch").cast("bigint").alias("batch"),
        "n_distinct_ngrams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_distinct_ngrams"), 6
        ).alias("novelty_rate"),
    ).orderBy("batch")


# --------------------------------------------------------------------------
# Train/val split leakage audit (round-8 slate): AFTER the hash-based
# split, how many validation documents still share a 5-gram with the
# training side? Document-level splits do NOT remove content overlap
# (near-duplicate docs land on both sides), and this operator measures
# exactly that residual — the eval-hygiene number to report next to
# any benchmark score. Composes the registered split rule
# (train_test_split's md5-bucket — interpolated from its oracle, so a
# split change breaks this audit loudly) with the corpus shingle
# machinery (decontaminate_ngram's _CONTAM_N). Shape at 100 TB: one
# exploded-shingle distinct + a semi-join of val grams against the
# train gram set (hash-partitioned on the gram key) — the same plan
# family as incremental_dedup_merge.
# --------------------------------------------------------------------------
def _register_split_leakage_audit() -> None:
    from bigdataentrytask_spark.operators import ORACLES

    oracle = f"""
    WITH splits AS ({ORACLES["train_test_split"]}),
    g AS (
      SELECT doc_id, {_sql_shingle_hashes(_CONTAM_N)} AS hashes
      FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents)
    ),
    e AS (
      SELECT DISTINCT g.doc_id, s.split, u.h
      FROM g JOIN splits s ON s.doc_id = g.doc_id, UNNEST(g.hashes) AS u(h)
    ),
    train_h AS (SELECT DISTINCT h FROM e WHERE split = 'train'),
    val AS (
      SELECT e.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(count_if(t.h IS NOT NULL) AS BIGINT) AS n_leaked
      FROM e LEFT JOIN train_h t ON t.h = e.h
      WHERE e.split = 'val'
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_val_docs,
           CAST(count_if(n_leaked > 0) AS BIGINT) AS n_contaminated_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_val_grams,
           CAST(SUM(n_leaked) AS BIGINT) AS total_leaked_grams,
           ROUND(CAST(SUM(n_leaked) AS DOUBLE) / SUM(n_grams), 6)
             AS leaked_gram_share,
           ROUND(CAST(count_if(n_leaked > 0) AS DOUBLE) / COUNT(*), 6)
             AS contaminated_doc_share
    FROM val
    """

    @operator("split_leakage_audit", oracle=oracle)
    def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
        splits = train_test_split(spark, sf_dir)
        g = _docs(spark, sf_dir).select(
            "doc_id", _shingle_hashes(_CONTAM_N).alias("hashes")
        )
        e = (
            g.join(splits, "doc_id")
            .select("doc_id", "split", F.explode("hashes").alias("h"))
            .distinct()
        )
        train_h = (
            e.filter(F.col("split") == "train").select("h").distinct()
            .withColumn("in_train", F.lit(1))
        )
        val = (
            e.filter(F.col("split") == "val")
            .join(train_h, "h", "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_grams"),
                F.sum(F.when(F.col("in_train").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_leaked"),
            )
        )
        return val.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_val_docs"),
            F.sum(F.when(F.col("n_leaked") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated_docs"),
            F.sum("n_grams").cast("bigint").alias("total_val_grams"),
            F.sum("n_leaked").cast("bigint").alias("total_leaked_grams"),
            F.round(
                F.sum("n_leaked").cast("double") / F.sum("n_grams"), 6
            ).alias("leaked_gram_share"),
            F.round(
                F.sum(F.when(F.col("n_leaked") > 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("contaminated_doc_share"),
        )


_register_split_leakage_audit()


# --------------------------------------------------------------------------
# BM25 retrieval top-k (round-8 slate): Okapi BM25 over the corpus for
# a fixed query set — the ranking function behind every lexical
# retrieval stage of a RAG / dedup-by-retrieval pipeline, and the
# scoring-side dual of inverted_index (which materializes the postings
# this query plan would read). idf uses the +1-robust form
# ln(1 + (N - df + 0.5)/(df + 0.5)); both engines evaluate the SAME
# expression tree on integers (tf, df, doclen, N, total tokens), so
# the doubles — and therefore the top-k order — are engine-identical.
#
# Scale posture (100 TB): tokenization + (doc,term) tf agg is the one
# fact-scale shuffle; df and the corpus length stats are term- and
# 1-row-sized broadcasts; the query-term table is a literal broadcast,
# so scoring touches ONLY postings of query terms (the inverted-index
# access path, expressed declaratively — Catalyst prunes everything
# else at the tf join). Top-k per query is a |queries|-partition
# window over candidate docs, never a global sort.
# --------------------------------------------------------------------------
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 5
_BM25_QUERIES = [
    ("q1", "spark"), ("q1", "join"), ("q1", "agg"),
    ("q2", "window"), ("q2", "sort"), ("q2", "stream"),
    ("q3", "hash"), ("q3", "merge"), ("q3", "scan"),
]


def _register_bm25_topk() -> None:
    qvals = ", ".join(f"('{q}', '{t}')" for q, t in _BM25_QUERIES)
    oracle = f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({sql_tokens('text')}) AS term FROM documents
    ),
    doclen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
               FROM toks GROUP BY 1),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(dl) AS BIGINT) AS total_toks
              FROM doclen),
    q(query_id, term) AS (VALUES {qvals}),
    scored AS (
      -- per-term contributions snapped to a 1e-12 integer grid so the
      -- per-doc SUM is exact under ANY accumulation order (the same
      -- trick as lsh_scurve_design's probability sums)
      SELECT q.query_id, tf.doc_id,
             CAST(SUM(CAST(ROUND(
               ln(1 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                   + {_BM25_B} * CAST(dl AS DOUBLE)
                     / (CAST(total_toks AS DOUBLE) / CAST(n AS DOUBLE))))
               * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score_e12
      FROM q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN doclen ON doclen.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, doc_id, score_e12,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY score_e12 DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id,
           ROUND(CAST(score_e12 AS DOUBLE) / 1000000000000.0, 6) AS bm25
    FROM ranked WHERE rnk <= {_BM25_K}
    ORDER BY query_id, rnk
    """

    @operator("bm25_topk", oracle=oracle)
    def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = _docs(spark, sf_dir)
        toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
        doclen = toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("dl")
        )
        tf = toks.groupBy("doc_id", "term").agg(
            F.count(F.lit(1)).cast("bigint").alias("tf")
        )
        df_ = toks.groupBy("term").agg(
            F.countDistinct("doc_id").cast("bigint").alias("df")
        )
        stats = doclen.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("dl").cast("bigint").alias("total_toks"),
        )
        q = spark.createDataFrame(_BM25_QUERIES, ["query_id", "term"])
        idf = F.log(
            1
            + (F.col("n").cast("double") - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        )
        norm = F.col("tf") + _BM25_K1 * (
            1.0
            - _BM25_B
            + _BM25_B
            * F.col("dl").cast("double")
            / (F.col("total_toks").cast("double") / F.col("n").cast("double"))
        )
        term_score = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / norm
        scored = (
            F.broadcast(q)
            .join(tf, "term")
            .join(F.broadcast(df_), "term")
            .join(doclen, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum(F.round(term_score * 1000000000000.0).cast("bigint"))
                .cast("bigint")
                .alias("score_e12")
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_e12").desc(), "doc_id"
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= _BM25_K)
            .select(
                "query_id",
                F.col("rnk").cast("bigint").alias("rnk"),
                "doc_id",
                F.round(
                    F.col("score_e12").cast("double") / 1000000000000.0, 6
                ).alias("bm25"),
            )
            .orderBy("query_id", "rnk")
        )


_register_bm25_topk()


# --------------------------------------------------------------------------
# Term burstiness profile (Church-Gale): for the 20 highest-volume
# terms, the variance-to-mean ratio of per-document counts (zeros
# included ANALYTICALLY — var over all N docs needs only the present-
# doc power sums plus N) and the adaptation probability p(2+ | 1+) =
# df2/df. Function words arrive ~Poisson (VMR near 1, low
# adaptation); content words are bursty (VMR >> 1) — the classic
# signal for stopword synthesis and quality weighting that plain
# frequency cannot give. Distinct from events_burstiness (a TIME-
# series Fano factor over event arrivals). One (term, doc) count
# agg -> one per-term agg; top-20 cut is a total order (count desc,
# term). VMR = (s2 - total^2/N) / total, pinned identically on both
# engines from exact integers.
# --------------------------------------------------------------------------
@operator(
    "term_burstiness_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({sql_tokens('text')}) AS term FROM documents
    ),
    td AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    per_term AS (
      SELECT term,
             CAST(SUM(c) AS BIGINT)             AS total_count,
             CAST(COUNT(*) AS BIGINT)           AS doc_freq,
             CAST(count_if(c >= 2) AS BIGINT)   AS doc_freq_2plus,
             CAST(SUM(c * c) AS BIGINT)         AS s2
      FROM td GROUP BY 1
    )
    SELECT term, total_count, doc_freq,
           ROUND((CAST(s2 AS DOUBLE)
                  - CAST(total_count AS DOUBLE) * total_count / n.n_docs)
                 / total_count, 6)                      AS vmr,
           ROUND(CAST(doc_freq_2plus AS DOUBLE) / doc_freq, 6)
                                                        AS adaptation
    FROM per_term CROSS JOIN n
    ORDER BY total_count DESC, term
    LIMIT 20
    """,
)
def term_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    td = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    per_term = td.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("total_count"),
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.count(F.when(F.col("c") >= 2, 1)).cast("bigint")
        .alias("doc_freq_2plus"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    out = per_term.crossJoin(F.broadcast(n))
    return (
        out.select(
            "term", "total_count", "doc_freq",
            F.round(
                (
                    F.col("s2").cast("double")
                    - F.col("total_count").cast("double")
                    * F.col("total_count") / F.col("n_docs")
                )
                / F.col("total_count"), 6
            ).alias("vmr"),
            F.round(
                F.col("doc_freq_2plus").cast("double") / F.col("doc_freq"), 6
            ).alias("adaptation"),
        )
        .orderBy(F.desc("total_count"), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Flesch-lite readability per source: words/sentence and
# syllables/word from three integer counts per document (tokens;
# '[.!?]+' sentence breaks; '[aeiouy]+' vowel groups as the syllable
# proxy — both RE2-safe, no backreferences), the per-document Flesch
# reading-ease score snapped onto a 1e6 grid BEFORE the per-source
# mean (snap-before-sum), and the corpus-level ratios computed from
# summed integers (ratio-of-sums, not mean-of-ratios). Pure column
# expressions + one grouped agg — the same shape as text_quality,
# adding the readability axis curation pipelines bucket on.
# --------------------------------------------------------------------------
@operator(
    "readability_scores",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             CAST(len({sql_tokens('text')}) AS BIGINT)                 AS w,
             CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT)                                           AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT)                                           AS syl
      FROM documents
    ), scored AS (
      SELECT source, w, s, syl,
             CAST(ROUND((206.835
                         - 1.015 * (CAST(w AS DOUBLE) / s)
                         - 84.6 * (CAST(syl AS DOUBLE) / w)) * 1000000.0)
                  AS BIGINT) AS fg
      FROM per_doc WHERE w > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                       AS n_docs,
           ROUND(CAST(SUM(w) AS DOUBLE) / SUM(s), 6)      AS words_per_sentence,
           ROUND(CAST(SUM(syl) AS DOUBLE) / SUM(w), 6)    AS syllables_per_word,
           ROUND(CAST(SUM(fg) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                                                          AS mean_flesch
    FROM scored GROUP BY source ORDER BY source
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "source",
        F.size(tokens("text")).cast("bigint").alias("w"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).cast("bigint").alias("s"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("bigint").alias("syl"),
    )
    scored = per_doc.filter(F.col("w") > 0).select(
        "source", "w", "s", "syl",
        F.round(
            (
                F.lit(206.835)
                - 1.015 * (F.col("w").cast("double") / F.col("s"))
                - 84.6 * (F.col("syl").cast("double") / F.col("w"))
            )
            * 1000000.0
        ).cast("bigint").alias("fg"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.sum("w").cast("double") / F.sum("s"), 6)
            .alias("words_per_sentence"),
            F.round(F.sum("syl").cast("double") / F.sum("w"), 6)
            .alias("syllables_per_word"),
            F.round(
                F.sum("fg").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("mean_flesch"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# OOV-rate sweep under vocabulary truncation: if the tokenizer keeps
# only the top-V token types (V in 500 / 1000 / 2000 / 5000), what
# share of token OCCURRENCES and of DOCUMENTS-with-an-OOV does the
# corpus lose? Token ranks come from one count table + one window
# over the (vocab-sized) type domain; the four vocab sizes are
# joinless conditional aggregates (the stack() pattern — no per-V
# scan, no theta join). The truncation-side twin of vocab_coverage
# (fixed external vocab) and tokenizer_compression_ratio (economics).
# --------------------------------------------------------------------------
@operator(
    "oov_rate_vocab_sweep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({sql_tokens('text')}) AS tok FROM documents
    ),
    counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
    ),
    ranked AS (
      SELECT tok, c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk
      FROM counts
    ),
    m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total_occ,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(COALESCE(SUM(CASE WHEN rnk > 500 THEN c END), 0)
                  AS BIGINT) AS oov500,
             CAST(COALESCE(SUM(CASE WHEN rnk > 1000 THEN c END), 0)
                  AS BIGINT) AS oov1000,
             CAST(COALESCE(SUM(CASE WHEN rnk > 2000 THEN c END), 0)
                  AS BIGINT) AS oov2000,
             CAST(COALESCE(SUM(CASE WHEN rnk > 5000 THEN c END), 0)
                  AS BIGINT) AS oov5000
      FROM ranked
    )
    SELECT vocab_size, n_types, total_occ, oov_occurrences,
           ROUND(CAST(oov_occurrences AS DOUBLE) / total_occ, 6)
             AS oov_rate
    FROM (
      SELECT 500 AS vocab_size, n_types, total_occ,
             oov500 AS oov_occurrences FROM m
      UNION ALL SELECT 1000, n_types, total_occ, oov1000 FROM m
      UNION ALL SELECT 2000, n_types, total_occ, oov2000 FROM m
      UNION ALL SELECT 5000, n_types, total_occ, oov5000 FROM m
    )
    ORDER BY vocab_size
    """,
)
def oov_rate_vocab_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = counts.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "tok")).alias("rnk"),
    )
    oov = {
        v: F.coalesce(
            F.sum(F.when(F.col("rnk") > v, F.col("c"))), F.lit(0)
        ).cast("bigint")
        for v in (500, 1000, 2000, 5000)
    }
    m = ranked.agg(
        F.sum("c").cast("bigint").alias("total_occ"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        *(oov[v].alias(f"oov{v}") for v in (500, 1000, 2000, 5000)),
    )
    stacked = m.select(
        F.expr(
            "stack(4, 500, oov500, 1000, oov1000, 2000, oov2000,"
            " 5000, oov5000) AS (vocab_size, oov_occurrences)"
        ),
        "n_types", "total_occ",
    )
    return stacked.select(
        F.col("vocab_size").cast("int").alias("vocab_size"),
        "n_types", "total_occ",
        F.col("oov_occurrences").cast("bigint").alias("oov_occurrences"),
        F.round(
            F.col("oov_occurrences").cast("double") / F.col("total_occ"), 6
        ).alias("oov_rate"),
    ).orderBy("vocab_size")


# --------------------------------------------------------------------------
# Prefix-filtering set-similarity join (the PPJoin-family principle):
# for Jaccard >= 0.8, two token SETS must share at least one token
# among each document's floor((1-t)*|s|)+1 RAREST tokens (global-
# frequency order; any common total order works) — so candidate
# generation joins only on those prefix tokens instead of every
# token, and the postings involved are by construction the SHORTEST
# ones. The oracle is the exact quadratic jaccard_pairs: equality
# proves the filter is COMPLETE (no pair lost), not just fast — the
# same honest-twin contract as minhash (which is probabilistic; this
# filter is lossless). Scale: candidate volume is bounded by the sum
# of squared RARE-token document frequencies — the Sigma df^2 bound
# over the smallest dfs, the quantity shingle_df_distribution
# reports; the verify step touches only candidates.
# --------------------------------------------------------------------------
@operator(
    "jaccard_prefix_filter_join",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_distinct({sql_tokens('text')})) AS tok
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(i / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def jaccard_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    ordered = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("by_rarity"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    # prefix length for t = 0.8: floor(0.2 * n) + 1
    prefix = ordered.select(
        "doc_id", "n",
        F.explode(
            F.slice(
                F.col("by_rarity"), 1,
                (F.floor(F.col("n") * 0.2) + 1).cast("int"),
            )
        ).alias("p"),
    ).select("doc_id", "n", F.col("p.tok").alias("tok"))
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), F.col("tok")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("tok")
    )
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = d.select(
        "doc_id", F.array_distinct(tokens("text")).alias("s")
    )
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"),
                              F.col("s").alias("sa")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"),
                          F.col("s").alias("sb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sa", "sb")).cast("bigint").alias("i"),
            F.size("sa").cast("bigint").alias("na"),
            F.size("sb").cast("bigint").alias("nb"),
        )
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
    return (
        verified.filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# K-fold metric stability: the classifier-vs-heuristic agreement
# (classifier_eval_metrics' headline) re-measured inside 5 md5-hash
# folds, with the across-fold mean and spread of accuracy — the
# cheap answer to "is that 0.9 accuracy a property of the model or
# of one lucky subset?". Folds are deterministic (portable md5 mod
# 5); per-fold confusion cells are conditional integer aggregates in
# ONE pass; the cross-fold mean sums 6-dp-snapped accuracies
# (order-free). Composes the two verified per-doc plans (classifier
# keep flag = pred; heuristic filter membership = truth).
# --------------------------------------------------------------------------
def _register_kfold_metric_stability() -> None:
    from bigdataentrytask_spark.operators import ORACLES, REGISTRY

    oracle = f"""
    WITH pred AS ({ORACLES["quality_classifier_score"]}),
    truth AS ({ORACLES["quality_filter"]}),
    joined AS (
      SELECT p.doc_id,
             ('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 5 AS fold,
             p.keep AS pred,
             (t.doc_id IS NOT NULL) AS truth
      FROM pred p LEFT JOIN truth t ON t.doc_id = p.doc_id
    ),
    per_fold AS (
      SELECT fold,
             CAST(count_if(pred AND truth) AS BIGINT)         AS tp,
             CAST(count_if(pred AND NOT truth) AS BIGINT)     AS fp,
             CAST(count_if(NOT pred AND truth) AS BIGINT)     AS fn,
             CAST(count_if(NOT pred AND NOT truth) AS BIGINT) AS tn
      FROM joined GROUP BY 1
    ),
    scored AS (
      SELECT fold, tp, fp, fn, tn,
             ROUND((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
               AS accuracy,
             ROUND(2.0 * tp / CAST(GREATEST(2 * tp + fp + fn, 1) AS DOUBLE), 6)
               AS f1
      FROM per_fold
    ),
    agg AS (
      SELECT ROUND(SUM(CAST(ROUND(accuracy * 1000000.0) AS BIGINT))
                   / COUNT(*) / 1000000.0, 6) AS acc_mean,
             ROUND(MAX(accuracy) - MIN(accuracy), 6) AS acc_spread
      FROM scored
    )
    SELECT s.fold, s.tp, s.fp, s.fn, s.tn, s.accuracy, s.f1,
           a.acc_mean, a.acc_spread
    FROM scored s CROSS JOIN agg a
    ORDER BY s.fold
    """

    @operator("kfold_metric_stability", oracle=oracle)
    def kfold_metric_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
        pred = REGISTRY["quality_classifier_score"](spark, sf_dir).select(
            "doc_id", F.col("keep").alias("pred")
        )
        truth = REGISTRY["quality_filter"](spark, sf_dir).select(
            F.col("doc_id").alias("t_id")
        )
        fold = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                   16, 10).cast("bigint") % 5
        )
        joined = pred.join(
            truth, pred.doc_id == truth.t_id, "left"
        ).select(
            fold.alias("fold"),
            "pred",
            F.col("t_id").isNotNull().alias("truth"),
        )
        p, t = F.col("pred"), F.col("truth")
        per_fold = joined.groupBy("fold").agg(
            F.count(F.when(p & t, 1)).cast("bigint").alias("tp"),
            F.count(F.when(p & ~t, 1)).cast("bigint").alias("fp"),
            F.count(F.when(~p & t, 1)).cast("bigint").alias("fn"),
            F.count(F.when(~p & ~t, 1)).cast("bigint").alias("tn"),
        )
        total = (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
        scored = per_fold.select(
            "fold", "tp", "fp", "fn", "tn",
            F.round(
                (F.col("tp") + F.col("tn")) / total.cast("double"), 6
            ).alias("accuracy"),
            F.round(
                2.0 * F.col("tp")
                / F.greatest(
                    2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)
                ).cast("double"), 6
            ).alias("f1"),
        )
        agg = scored.agg(
            F.round(
                F.sum(F.round(F.col("accuracy") * 1000000.0).cast("bigint"))
                / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("acc_mean"),
            F.round(F.max("accuracy") - F.min("accuracy"), 6)
            .alias("acc_spread"),
        )
        return (
            scored.crossJoin(F.broadcast(agg))
            .select("fold", "tp", "fp", "fn", "tn", "accuracy", "f1",
                    "acc_mean", "acc_spread")
            .orderBy("fold")
        )


_register_kfold_metric_stability()


# --------------------------------------------------------------------------
# The production similarity-join PIPELINE the stress DNF mandates:
# exact-dedup FIRST (one hash groupBy collapsing identical texts to
# their min-doc_id representative — duplication clusters vanish in
# one cheap pass), THEN the lossless prefix-filter join on the
# representatives. Against the raw jaccard_prefix_filter_join (which
# the 8x-duplication stress DNF'd, SCALE.md), this is the ordering
# dedup_pipeline_funnel documents — here made a single verified
# operator. Oracle = exact quadratic jaccard over representatives,
# so completeness of the composed pipeline is the checked contract.
# --------------------------------------------------------------------------
@operator(
    "dedup_then_prefix_filter",
    oracle=f"""
    WITH reps AS (
      SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
      FROM documents GROUP BY md5(text)
    ),
    toks AS (
      SELECT doc_id, UNNEST(list_distinct({sql_tokens('text')})) AS tok
      FROM reps
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(i / CAST(sa.n + sb.n - i AS DOUBLE), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def dedup_then_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    reps = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"), F.any_value("text").alias("text"))
        .select("doc_id", "text")
    )
    toks = reps.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    ordered = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("tok")))
            ).alias("by_rarity"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    prefix = ordered.select(
        "doc_id",
        F.explode(
            F.slice(
                F.col("by_rarity"), 1,
                (F.floor(F.col("n") * 0.2) + 1).cast("int"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.tok").alias("tok"))
    a = prefix.select(F.col("doc_id").alias("doc_a"), "tok")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = reps.select(
        "doc_id", F.array_distinct(tokens("text")).alias("s")
    )
    verified = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"),
                              F.col("s").alias("sa")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"),
                          F.col("s").alias("sb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.size(F.array_intersect("sa", "sb")).cast("bigint").alias("i"),
            F.size("sa").cast("bigint").alias("na"),
            F.size("sb").cast("bigint").alias("nb"),
        )
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
    return (
        verified.filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# ROUND-10 STAGED (round-11 candidate pulled forward): boilerplate
# chunk census. Crawled corpora carry repeated headers/footers; the
# standard detector is "does a document's LEADING (or TRAILING)
# fixed-size chunk hash-match another document of the same source?".
# Per source: doc count, shared-head share, shared-tail share (ppm) —
# the table that decides whether a source needs boilerplate stripping
# before dedup (a shared header inflates every Jaccard score).
#
# Scale: two (source, chunk) aggregations over one chunk per doc each
# — map-side partial, source-sized output; no pair enumeration.
# --------------------------------------------------------------------------
_BP_WORDS = 10


_BOILERPLATE_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
    ),
    ht AS (
      SELECT doc_id, source,
             array_to_string(list_slice(ws, 1, {_BP_WORDS}), ' ') AS head,
             array_to_string(
               list_slice(ws, GREATEST(len(ws) - {_BP_WORDS} + 1, 1),
                          len(ws)), ' ') AS tail
      FROM w
    ),
    hs AS (
      SELECT source, head, COUNT(*) AS c FROM ht GROUP BY 1, 2
    ),
    ts AS (
      SELECT source, tail, COUNT(*) AS c FROM ht GROUP BY 1, 2
    ),
    agg AS (
      SELECT h.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN hs.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_head,
             CAST(SUM(CASE WHEN ts.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_tail
      FROM ht h
      JOIN hs ON hs.source = h.source AND hs.head = h.head
      JOIN ts ON ts.source = h.source AND ts.tail = h.tail
      GROUP BY 1
    )
    SELECT source, n_docs, n_shared_head, n_shared_tail,
           CAST(ROUND(n_shared_head * 1000000.0 / n_docs) AS BIGINT)
             AS head_share_ppm,
           CAST(ROUND(n_shared_tail * 1000000.0 / n_docs) AS BIGINT)
             AS tail_share_ppm
    FROM agg ORDER BY source
    """


def boilerplate_chunk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared leading/trailing chunk share per source (see staged
    block comment)."""
    w = _docs(spark, sf_dir).select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    ht = w.select(
        "doc_id",
        "source",
        F.array_join(F.slice("ws", 1, _BP_WORDS), " ").alias("head"),
        F.array_join(
            F.slice(
                "ws",
                F.greatest(F.size("ws") - _BP_WORDS + 1, F.lit(1)),
                F.lit(_BP_WORDS),
            ),
            " ",
        ).alias("tail"),
    )
    hs = ht.groupBy("source", "head").agg(F.count(F.lit(1)).alias("hc"))
    ts = ht.groupBy("source", "tail").agg(F.count(F.lit(1)).alias("tc"))
    agg = (
        ht.join(hs, ["source", "head"])
        .join(ts, ["source", "tail"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("hc") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_head"),
            F.sum(F.when(F.col("tc") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_tail"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_shared_head",
        "n_shared_tail",
        F.round(F.col("n_shared_head") * 1000000.0 / F.col("n_docs"))
        .cast("bigint")
        .alias("head_share_ppm"),
        F.round(F.col("n_shared_tail") * 1000000.0 / F.col("n_docs"))
        .cast("bigint")
        .alias("tail_share_ppm"),
    ).orderBy("source")


ROUND10_STAGED: dict[str, tuple] = {
    "boilerplate_chunk_census": (
        boilerplate_chunk_census,
        _BOILERPLATE_ORACLE,
    ),
}


# --------------------------------------------------------------------------
# ROUND-10 STAGED (round-11 candidate pulled forward): length-outlier
# truncation audit. Two ingest-defect signals per source: (1) the
# share of documents at EXACTLY the per-source maximum length — a
# spike there is the "truncated at ingest" fingerprint (a natural
# length distribution has a thin max); (2) the count above a robust
# median + 3*MAD fence. Median and MAD are DISCRETE rank picks
# (lower median, rank ceil(n/2)) in integer character space — no
# interpolation, no float path, exact on both engines.
# Scale: two windowed rank picks + one agg, all partitioned by source.
# --------------------------------------------------------------------------
_TRUNC_ORACLE = """
    WITH lens AS (
      SELECT source, doc_id, length(text) AS len FROM documents
    ),
    r1 AS (
      SELECT source, len,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY len) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM lens
    ),
    med AS (
      SELECT source, MIN(len) AS med_len
      FROM r1 WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT) GROUP BY 1
    ),
    dev AS (
      SELECT l.source, ABS(l.len - m.med_len) AS d
      FROM lens l JOIN med m ON m.source = l.source
    ),
    r2 AS (
      SELECT source, d,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY d) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM dev
    ),
    mad AS (
      SELECT source, MIN(d) AS mad_len
      FROM r2 WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT) GROUP BY 1
    )
    ,wmax AS (
      SELECT source, len,
             MAX(len) OVER (PARTITION BY source) AS src_max
      FROM lens
    )
    SELECT w.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ANY_VALUE(w.src_max) AS BIGINT) AS max_len,
           CAST(SUM(CASE WHEN w.len = w.src_max THEN 1 ELSE 0 END)
                AS BIGINT) AS n_at_max,
           CAST(ROUND(SUM(CASE WHEN w.len = w.src_max THEN 1 ELSE 0 END)
                      * 1000000.0 / COUNT(*)) AS BIGINT) AS at_max_ppm,
           CAST(ANY_VALUE(m.med_len) AS BIGINT) AS med_len,
           CAST(ANY_VALUE(d.mad_len) AS BIGINT) AS mad_len,
           CAST(SUM(CASE WHEN w.len > m.med_len + 3 * d.mad_len
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_above_fence
    FROM wmax w
    JOIN med m ON m.source = w.source
    JOIN mad d ON d.source = w.source
    GROUP BY w.source
    ORDER BY w.source
    """


def length_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source truncation-spike + robust-fence outlier census (see
    staged block comment)."""
    lens = _docs(spark, sf_dir).select(
        "source", "doc_id", F.length("text").cast("bigint").alias("len")
    )
    ws = Window.partitionBy("source")
    r1 = lens.select(
        "source",
        "len",
        F.row_number().over(ws.orderBy("len")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    med = (
        r1.filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .groupBy("source")
        .agg(F.min("len").alias("med_len"))
    )
    dev = lens.join(med, "source").select(
        "source", F.abs(F.col("len") - F.col("med_len")).alias("d")
    )
    r2 = dev.select(
        "source",
        "d",
        F.row_number().over(ws.orderBy("d")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    mad = (
        r2.filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .groupBy("source")
        .agg(F.min("d").alias("mad_len"))
    )
    wmax = lens.select(
        "source", "len", F.max("len").over(ws).alias("src_max")
    )
    at_max = F.when(F.col("len") == F.col("src_max"), 1).otherwise(0)
    return (
        wmax.join(med, "source")
        .join(mad, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.first("src_max").cast("bigint").alias("max_len"),
            F.sum(at_max).cast("bigint").alias("n_at_max"),
            F.round(
                F.sum(at_max) * 1000000.0 / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("at_max_ppm"),
            F.first("med_len").cast("bigint").alias("med_len"),
            F.first("mad_len").cast("bigint").alias("mad_len"),
            F.sum(
                F.when(
                    F.col("len")
                    > F.col("med_len") + 3 * F.col("mad_len"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_above_fence"),
        )
        .orderBy("source")
    )


ROUND10_STAGED["length_truncation_audit"] = (
    length_truncation_audit,
    _TRUNC_ORACLE,
)


# ==========================================================================
# ROUND-11 STAGED (VERDICT r9 item 6; zero registry delta until the
# round-11 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Intra-document repetition audit (Gopher rule family, Rae et al.
# 2021 §A1.1): per SOURCE, how much of each document is repeated
# word-3-gram mass — the classic boilerplate/template/spam signal a
# quality filter thresholds BEFORE dedup ever runs. Per document:
# duplicate-gram fraction = 1 - distinct_grams/total_grams, in ppm;
# rolled up per source as mean ppm + share of docs over the Gopher-ish
# 180000 ppm (18%) flag line. Summary rows (not per-doc) so the output
# stays domain-sized at any corpus scale.
# Scale: gram explode is width-bounded (one row per word); the
# per-doc distinct count is a (doc_id, gram) partial-agg shuffle; the
# rollup is domain-sized. No cross-document state anywhere — this
# pipelines at 100 TB with zero skew risk beyond document length.
# --------------------------------------------------------------------------
_REP_K = 3
_REP_FLAG_PPM = 180_000

_INTRA_REP_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             array_to_string(w[i:i+{_REP_K - 1}], ' ') AS g
      FROM toks, LATERAL unnest(range(1, len(w) - {_REP_K} + 2)) AS t(i)
    ),
    per_doc AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
      FROM grams GROUP BY 1, 2
    ),
    scored AS (
      SELECT source,
             CAST(ROUND((n_grams - n_distinct) * 1000000.0 / n_grams)
                  AS BIGINT) AS rep_ppm
      FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ROUND(AVG(rep_ppm)) AS BIGINT) AS mean_rep_ppm,
           CAST(MAX(rep_ppm) AS BIGINT) AS max_rep_ppm,
           CAST(count_if(rep_ppm > {_REP_FLAG_PPM}) AS BIGINT) AS n_flagged
    FROM scored GROUP BY source
    ORDER BY source
    """


def intra_doc_repetition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repeated word-3-gram census (see block comment)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("w"))
    gram_at = lambda i: F.array_join(  # noqa: E731
        F.slice("w", i + 1, _REP_K), " "
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.when(
                F.size("w") >= _REP_K,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - _REP_K), gram_at
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    per_doc = grams.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.count_distinct("g").cast("bigint").alias("n_distinct"),
    )
    rep_ppm = F.round(
        (F.col("n_grams") - F.col("n_distinct")) * 1000000.0
        / F.col("n_grams")
    ).cast("bigint")
    return (
        per_doc.select("source", rep_ppm.alias("rep_ppm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("rep_ppm")).cast("bigint").alias("mean_rep_ppm"),
            F.max("rep_ppm").cast("bigint").alias("max_rep_ppm"),
            F.sum((F.col("rep_ppm") > _REP_FLAG_PPM).cast("long"))
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Domain-mix planner (training-mixture table, The Pile / DoReMi-lite
# static arithmetic): per source — document and whitespace-token
# counts, the source's share of total tokens (ppm), and the sampling
# weight (ppm, relative to 1x = 1000000) that would rebalance the
# corpus to a UNIFORM per-source token budget: weight = target_share /
# actual_share. Oversampling caps at the repeat ceiling (4x here —
# past ~4 epochs of a source, repetition hurts more than balance
# helps), mirroring how real mixture tables clamp rare domains.
# Scale: one aggregation over documents; output is |sources| rows.
# --------------------------------------------------------------------------
_MIX_MAX_WEIGHT_PPM = 4_000_000

_DOMAIN_MIX_ORACLE = f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_tokens) AS t, COUNT(*) AS s FROM per)
    SELECT p.source, p.n_docs, p.n_tokens,
           CAST(ROUND(p.n_tokens * 1000000.0 / tot.t) AS BIGINT)
             AS token_share_ppm,
           CAST(LEAST(
             ROUND((tot.t * 1.0 / tot.s) / p.n_tokens * 1000000.0),
             {_MIX_MAX_WEIGHT_PPM}) AS BIGINT) AS uniform_weight_ppm,
           ROUND((tot.t * 1.0 / tot.s) / p.n_tokens * 1000000.0)
             > {_MIX_MAX_WEIGHT_PPM} AS weight_clamped
    FROM per p CROSS JOIN tot
    ORDER BY p.source
    """


def domain_mix_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token share + uniform-rebalance sampling weight (see
    block comment)."""
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("s")
    )
    raw_w = F.round(
        (F.col("t") / F.col("s")) / F.col("n_tokens") * 1000000.0
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") * 1000000.0 / F.col("t"))
            .cast("bigint")
            .alias("token_share_ppm"),
            F.least(raw_w, F.lit(_MIX_MAX_WEIGHT_PPM))
            .cast("bigint")
            .alias("uniform_weight_ppm"),
            (raw_w > _MIX_MAX_WEIGHT_PPM).alias("weight_clamped"),
        )
        .orderBy("source")
    )


ROUND11_STAGED: dict[str, tuple] = {
    "intra_doc_repetition_audit": (
        intra_doc_repetition_audit,
        _INTRA_REP_ORACLE,
    ),
    "domain_mix_planner": (domain_mix_planner, _DOMAIN_MIX_ORACLE),
}


# ==========================================================================
# ROUND-12 STAGED (VERDICT r10 item 7; zero registry delta until the
# round-12 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Perplexity pruning gate (ROADMAP round-12 "Curation"): the
# quality_threshold_pruning pattern on the LANGUAGE-MODEL axis, per
# SOURCE — CCNet prunes each source/shard at a percentile of its own
# LM score, not at one global threshold, so "cut the worst 10% per
# source" is the release-gate shape a trainer actually deploys.
# Scores are the verified add-one-smoothed bigram logprobs
# (bigram_lm_logprob's exact 1e6-grid arithmetic, rescored over ALL
# docs — its registry twin caps scoring at doc_id < 100 for the
# audit slice). Per source: the exact discrete 10% threshold (the
# (k+1)-th smallest score, k = floor(n/10)), pruned count, and the
# percentile_approx sketch rank-contract boolean — the production
# path is sketch + filter (no global sort), the exact columns are
# the audit content, per the column_quantile_sketch_gate pattern.
# Scale: the LM counts shuffle on the bigram key (one pass); the
# per-source window is keyed (bounded state per task); the sketch is
# a mergeable single aggregate.
# --------------------------------------------------------------------------
_PPG_FRAC_PPM = 100_000  # prune the worst 10% of each source
_PPG_ACC = 1000          # percentile_approx accuracy knob

_PPG_ORACLE = f"""
    WITH {LM_SCORED_CTES}    tagged AS (
      SELECT d.source, s.score_e6,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY s.score_e6, s.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY d.source) AS n_src
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    cut AS (
      SELECT source, CAST(MAX(n_src) AS BIGINT) AS n_scored,
             MIN(CASE WHEN rn > n_src * {_PPG_FRAC_PPM} // 1000000
                      THEN score_e6 END) AS exact_thresh_e6
      FROM tagged GROUP BY source
    )
    SELECT c.source, c.n_scored,
           CAST(c.exact_thresh_e6 AS BIGINT) AS exact_thresh_e6,
           (SELECT CAST(count_if(t.score_e6 < c.exact_thresh_e6)
                        AS BIGINT)
              FROM tagged t WHERE t.source = c.source) AS n_pruned,
           (SELECT CAST(ROUND(count_if(t.score_e6 < c.exact_thresh_e6)
                              * 1000000.0 / c.n_scored) AS BIGINT)
              FROM tagged t WHERE t.source = c.source) AS prune_ppm,
           TRUE AS sketch_rank_ok
    FROM cut c
    ORDER BY c.source
    """


def perplexity_pruning_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 10%-percentile LM-score pruning gate (see block
    comment): exact discrete thresholds as audit content, plus the
    percentile_approx sketch rank-contract boolean the production
    filter relies on."""
    d = _docs(spark, sf_dir)
    scored = lm_doc_scores(d)
    tagged = scored.join(
        d.select("doc_id", "source"), "doc_id"
    ).select("source", "doc_id", "score_e6")
    ws = Window.partitionBy("source").orderBy("score_e6", "doc_id")
    ranked = tagged.select(
        "source",
        "score_e6",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_src"),
    )
    cut = ranked.groupBy("source").agg(
        F.max("n_src").cast("bigint").alias("n_scored"),
        F.min(
            F.when(
                F.col("rn")
                > F.floor(F.col("n_src") * _PPG_FRAC_PPM / 1000000),
                F.col("score_e6"),
            )
        ).alias("exact_thresh_e6"),
        # production sketch: one mergeable percentile_approx per source
        F.percentile_approx(
            "score_e6", _PPG_FRAC_PPM / 1e6, _PPG_ACC
        ).alias("sketch_t"),
    )
    gates = (
        ranked.join(F.broadcast(cut), "source")
        .groupBy("source")
        .agg(
            F.sum(
                (F.col("score_e6") < F.col("exact_thresh_e6")).cast("long")
            )
            .cast("bigint")
            .alias("n_pruned"),
            F.sum((F.col("score_e6") < F.col("sketch_t")).cast("long"))
            .alias("n_lt_sketch"),
            F.sum((F.col("score_e6") <= F.col("sketch_t")).cast("long"))
            .alias("n_le_sketch"),
        )
    )
    err = F.ceil(F.col("n_scored") / _PPG_ACC)
    target = F.col("n_scored") * _PPG_FRAC_PPM / 1000000.0
    return (
        cut.join(gates, "source")
        .select(
            "source",
            "n_scored",
            F.col("exact_thresh_e6").cast("bigint").alias(
                "exact_thresh_e6"
            ),
            "n_pruned",
            F.round(F.col("n_pruned") * 1000000.0 / F.col("n_scored"))
            .cast("bigint")
            .alias("prune_ppm"),
            (
                (F.col("n_lt_sketch") <= target + err)
                & (F.col("n_le_sketch") >= target - err)
            ).alias("sketch_rank_ok"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Pack-length sweep (ROADMAP round-13 family, pulled forward): the
# context-length decision table. sequence_pack packs at ONE budget;
# this sweeps candidate context lengths through the same per-source
# continuous-flow rule and reports, per candidate: sequences
# produced, fill ratio (tail waste is the only waste under
# continuous flow — each source's last sequence), and how many
# documents STRADDLE a sequence boundary (the coherence cost of
# small contexts: a straddled doc is split across training
# sequences). Fill rises and straddling falls as L shrinks — the
# trade a pretraining config picks L against.
# Exact math: BPE-ish token counts (the llm_token_estimate regex),
# integer cumsum offsets, integer boundary tests; the only division
# is the final ppm.
# Scale: per-source windows (keyed, bounded state), a |L|-stack of
# column expressions over one cumsum — no per-candidate rescan.
# --------------------------------------------------------------------------
_PACK_SWEEP_LENS = [128, 512, 2048]

_PACK_SWEEP_ORACLE = f"""
    WITH t AS (
      SELECT source, doc_id,
             len(regexp_extract_all(lower(text), '{_BPEISH_RE}')) AS tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, tok,
             SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS start_off
      FROM t
    ),
    lens(context_len) AS (VALUES
      {", ".join(f"({x})" for x in _PACK_SWEEP_LENS)}),
    per_src AS (
      SELECT source, SUM(tok) AS src_tok FROM t GROUP BY source
    ),
    seqs AS (
      SELECT l.context_len,
             CAST(SUM(CAST(CEIL(p.src_tok * 1.0 / l.context_len)
                           AS BIGINT)) AS BIGINT) AS n_seqs,
             CAST(SUM(p.src_tok) AS BIGINT) AS total_tok
      FROM per_src p CROSS JOIN lens l
      GROUP BY 1
    ),
    straddle AS (
      SELECT l.context_len,
             CAST(count_if(c.tok > 0 AND
                   FLOOR(c.start_off / l.context_len)
                   <> FLOOR((c.start_off + c.tok - 1) / l.context_len))
                  AS BIGINT) AS n_docs_straddling,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM c CROSS JOIN lens l
      GROUP BY 1
    )
    SELECT CAST(s.context_len AS BIGINT) AS context_len,
           s.n_seqs, s.total_tok,
           CAST(ROUND(s.total_tok * 1000000.0
                      / (s.n_seqs * s.context_len)) AS BIGINT)
             AS fill_ppm,
           st.n_docs_straddling,
           CAST(ROUND(st.n_docs_straddling * 1000000.0 / st.n_docs)
                AS BIGINT) AS straddle_ppm
    FROM seqs s JOIN straddle st ON st.context_len = s.context_len
    ORDER BY s.context_len
    """


def pack_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill vs doc-straddling per candidate context length under the
    sequence_pack continuous-flow rule (see block comment)."""
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
    lens = spark.createDataFrame(
        [(x,) for x in _PACK_SWEEP_LENS], "context_len long"
    )
    per_src = c.groupBy("source").agg(F.sum("tok").alias("src_tok"))
    seqs = (
        per_src.crossJoin(F.broadcast(lens))
        .groupBy("context_len")
        .agg(
            F.sum(
                F.ceil(F.col("src_tok") * 1.0 / F.col("context_len"))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("n_seqs"),
            F.sum("src_tok").cast("bigint").alias("total_tok"),
        )
    )
    straddle = (
        c.crossJoin(F.broadcast(lens))
        .groupBy("context_len")
        .agg(
            F.sum(
                (
                    (F.col("tok") > 0)
                    & (
                        F.floor(F.col("start_off") / F.col("context_len"))
                        != F.floor(
                            (F.col("start_off") + F.col("tok") - 1)
                            / F.col("context_len")
                        )
                    )
                ).cast("long")
            )
            .cast("bigint")
            .alias("n_docs_straddling"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )
    return (
        seqs.join(straddle, "context_len")
        .select(
            F.col("context_len").cast("bigint").alias("context_len"),
            "n_seqs",
            "total_tok",
            F.round(
                F.col("total_tok")
                * 1000000.0
                / (F.col("n_seqs") * F.col("context_len"))
            )
            .cast("bigint")
            .alias("fill_ppm"),
            "n_docs_straddling",
            F.round(
                F.col("n_docs_straddling") * 1000000.0 / F.col("n_docs")
            )
            .cast("bigint")
            .alias("straddle_ppm"),
        )
        .orderBy("context_len")
    )


ROUND12_STAGED: dict[str, tuple] = {
    "perplexity_pruning_gate": (perplexity_pruning_gate, _PPG_ORACLE),
    "pack_length_sweep": (pack_length_sweep, _PACK_SWEEP_ORACLE),
}


# ==========================================================================
# ROUND-13 STAGED (VERDICT r11 item 6; zero registry delta until the
# round-13 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Language x source perplexity gate (ROADMAP round-13 "Curation"):
# the CCNet regime proper. perplexity_pruning_gate prunes the worst
# 10% PER SOURCE; CCNet's actual unit is per-LANGUAGE (each language
# gets its own LM and its own percentile cut), and a multilingual
# multi-source corpus needs the crossed grid — a source whose German
# slice is bottom-decile German should lose that slice even when its
# English slice is pristine. Same verified scored frame (add-one-
# smoothed bigram logprobs on the exact 1e6 grid), same exact
# discrete threshold ((k+1)-th smallest, k = floor(n/10)) and
# percentile_approx rank contract — re-keyed on (lang, source).
# Group sizes here are ~25x smaller than the per-source gate's, so
# the table also pins the small-n degradation honestly: groups with
# n < 10 have k = 0, threshold = their minimum score, zero pruned.
# Scale: identical posture to perplexity_pruning_gate — one
# bigram-key shuffle for the LM counts, keyed windows on the
# (lang, source) grid (bounded state), one mergeable sketch per
# group.
# --------------------------------------------------------------------------
_PPGL_ORACLE = f"""
    WITH {LM_SCORED_CTES}    tagged AS (
      SELECT d.lang, d.source, s.score_e6,
             ROW_NUMBER() OVER (PARTITION BY d.lang, d.source
                                ORDER BY s.score_e6, s.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY d.lang, d.source) AS n_grp
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    cut AS (
      SELECT lang, source, CAST(MAX(n_grp) AS BIGINT) AS n_scored,
             MIN(CASE WHEN rn > n_grp * {_PPG_FRAC_PPM} // 1000000
                      THEN score_e6 END) AS exact_thresh_e6
      FROM tagged GROUP BY lang, source
    )
    SELECT c.lang, c.source, c.n_scored,
           CAST(c.exact_thresh_e6 AS BIGINT) AS exact_thresh_e6,
           (SELECT CAST(count_if(t.score_e6 < c.exact_thresh_e6)
                        AS BIGINT)
              FROM tagged t
             WHERE t.lang = c.lang AND t.source = c.source) AS n_pruned,
           (SELECT CAST(ROUND(count_if(t.score_e6 < c.exact_thresh_e6)
                              * 1000000.0 / c.n_scored) AS BIGINT)
              FROM tagged t
             WHERE t.lang = c.lang AND t.source = c.source)
             AS prune_ppm,
           TRUE AS sketch_rank_ok
    FROM cut c
    ORDER BY c.lang, c.source
    """


def perplexity_gate_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(lang, source) 10%-percentile LM-score pruning gate (see
    block comment): perplexity_pruning_gate's exact-threshold +
    sketch-contract shape on the CCNet per-language grid."""
    d = _docs(spark, sf_dir)
    scored = lm_doc_scores(d)
    tagged = scored.join(
        d.select("doc_id", "lang", "source"), "doc_id"
    ).select("lang", "source", "doc_id", "score_e6")
    ws = Window.partitionBy("lang", "source").orderBy(
        "score_e6", "doc_id"
    )
    ranked = tagged.select(
        "lang",
        "source",
        "score_e6",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang", "source"))
        .alias("n_grp"),
    )
    cut = ranked.groupBy("lang", "source").agg(
        F.max("n_grp").cast("bigint").alias("n_scored"),
        F.min(
            F.when(
                F.col("rn")
                > F.floor(F.col("n_grp") * _PPG_FRAC_PPM / 1000000),
                F.col("score_e6"),
            )
        ).alias("exact_thresh_e6"),
        F.percentile_approx(
            "score_e6", _PPG_FRAC_PPM / 1e6, _PPG_ACC
        ).alias("sketch_t"),
    )
    gates = (
        ranked.join(F.broadcast(cut), ["lang", "source"])
        .groupBy("lang", "source")
        .agg(
            F.sum(
                (F.col("score_e6") < F.col("exact_thresh_e6")).cast("long")
            )
            .cast("bigint")
            .alias("n_pruned"),
            F.sum((F.col("score_e6") < F.col("sketch_t")).cast("long"))
            .alias("n_lt_sketch"),
            F.sum((F.col("score_e6") <= F.col("sketch_t")).cast("long"))
            .alias("n_le_sketch"),
        )
    )
    err = F.ceil(F.col("n_scored") / _PPG_ACC)
    target = F.col("n_scored") * _PPG_FRAC_PPM / 1000000.0
    return (
        cut.join(gates, ["lang", "source"])
        .select(
            "lang",
            "source",
            "n_scored",
            F.col("exact_thresh_e6").cast("bigint").alias(
                "exact_thresh_e6"
            ),
            "n_pruned",
            F.round(F.col("n_pruned") * 1000000.0 / F.col("n_scored"))
            .cast("bigint")
            .alias("prune_ppm"),
            (
                (F.col("n_lt_sketch") <= target + err)
                & (F.col("n_le_sketch") >= target - err)
            ).alias("sketch_rank_ok"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Padding-mode pack sweep (ROADMAP round-13 "Curation"): the
# no-straddle variant of pack_length_sweep. Continuous flow maximizes
# fill but splits documents across training sequences; padding mode
# keeps every document inside one sequence (a doc that does not fit
# in the current sequence's remainder pads it out and starts the
# next), trading fill for coherence — only OVERSIZE docs (token
# count > L) still have to span sequences. The greedy per-source
# cursor is a genuine sequential recurrence (each doc's start
# depends on the padded position of everything before it), so this
# is one of the repo's few sanctioned Arrow-kernel operators: an
# applyInPandas walk per source (parallel across sources — exactly a
# packer's shard-local loop), mirrored by a recursive CTE on the
# oracle side. Reported per candidate L: sequences, exact pad-token
# waste, fill, and the oversize count, cross-pinnable against
# pack_length_sweep (same total_tok; pad-mode fill <= flow fill;
# oversize docs <= flow's straddling docs).
# Exact math: integer token counts and cursors end-to-end; the two
# ppm columns are the only divisions.
# Scale: the kernel is O(docs-per-source x |L|) with integer state —
# at 100 TB the per-source groups are the packer's shard units and
# the rollup is |L|-keyed.
# --------------------------------------------------------------------------
_PAD_SWEEP_ORACLE = f"""
    WITH RECURSIVE t AS (
      SELECT source, doc_id,
             len(regexp_extract_all(lower(text), '{_BPEISH_RE}')) AS tok
      FROM documents
    ),
    lens(context_len) AS (VALUES
      {", ".join(f"({x})" for x in _PACK_SWEEP_LENS)}),
    dl AS (
      SELECT t.source, l.context_len, t.tok,
             ROW_NUMBER() OVER (PARTITION BY t.source, l.context_len
                                ORDER BY t.doc_id) AS rn
      FROM t CROSS JOIN lens l
      WHERE t.tok > 0
    ),
    walk AS (
      SELECT source, context_len, rn, tok AS pos,
             CASE WHEN tok > context_len THEN 1 ELSE 0 END AS n_over
      FROM dl WHERE rn = 1
      UNION ALL
      SELECT d.source, d.context_len, d.rn,
             CASE WHEN (w.pos % d.context_len) = 0
                       OR d.tok <= d.context_len
                                   - (w.pos % d.context_len)
                  THEN w.pos + d.tok
                  ELSE w.pos + (d.context_len
                                - (w.pos % d.context_len)) + d.tok
             END,
             w.n_over + CASE WHEN d.tok > d.context_len
                             THEN 1 ELSE 0 END
      FROM walk w
      JOIN dl d ON d.source = w.source
               AND d.context_len = w.context_len AND d.rn = w.rn + 1
    ),
    fin AS (
      SELECT source, context_len, pos, n_over
      FROM (
        SELECT source, context_len, pos, n_over,
               ROW_NUMBER() OVER (PARTITION BY source, context_len
                                  ORDER BY rn DESC) AS r
        FROM walk
      ) WHERE r = 1
    ),
    per_src AS (
      SELECT f.source, f.context_len,
             CAST(CEIL(f.pos * 1.0 / f.context_len) AS BIGINT)
               AS n_seqs,
             f.n_over,
             (SELECT CAST(SUM(t.tok) AS BIGINT) FROM t
               WHERE t.source = f.source) AS src_tok
      FROM fin f
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM t)
    SELECT CAST(p.context_len AS BIGINT) AS context_len,
           CAST(SUM(p.n_seqs) AS BIGINT) AS n_seqs,
           CAST(SUM(p.src_tok) AS BIGINT) AS total_tok,
           CAST(SUM(p.n_seqs * p.context_len - p.src_tok) AS BIGINT)
             AS pad_tokens,
           CAST(ROUND(SUM(p.src_tok) * 1000000.0
                      / (SUM(p.n_seqs) * p.context_len)) AS BIGINT)
             AS fill_ppm,
           CAST(SUM(p.n_over) AS BIGINT) AS n_oversize,
           CAST(ROUND(SUM(p.n_over) * 1000000.0 / MAX(nd.n_docs))
                AS BIGINT) AS oversize_ppm
    FROM per_src p CROSS JOIN nd
    GROUP BY p.context_len
    ORDER BY context_len
    """


def _pad_pack_kernel(lens: list[int]):
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        src = pdf["source"].iloc[0]
        toks = [int(x) for x in pdf["tok"] if x > 0]
        src_tok = sum(toks)
        rows = []
        for L in lens:
            pos, n_over = 0, 0
            for tok in toks:
                rem = L - (pos % L)
                if (pos % L) != 0 and tok > rem:
                    pos += rem
                pos += tok
                if tok > L:
                    n_over += 1
            n_seqs = -(-pos // L) if pos else 0
            rows.append((src, L, n_seqs, src_tok, n_over))
        return pd.DataFrame(
            rows,
            columns=["source", "context_len", "n_seqs", "src_tok",
                     "n_over"],
        )

    return kernel


def pack_padding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-straddle (padding-mode) packing per candidate context
    length: sequences, exact pad waste, fill, oversize docs (see
    block comment; sequential per-source cursor via an Arrow
    kernel)."""
    d = _docs(spark, sf_dir)
    tok = F.regexp_count(F.lower("text"), F.lit(_BPEISH_RE))
    t = d.select("source", "doc_id", tok.alias("tok"))
    per_src = (
        t.groupBy("source")
        .applyInPandas(
            _pad_pack_kernel(_PACK_SWEEP_LENS),
            schema=(
                "source string, context_len long, n_seqs long, "
                "src_tok long, n_over long"
            ),
        )
    )
    nd = t.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        per_src.crossJoin(F.broadcast(nd))
        .groupBy("context_len")
        .agg(
            F.sum("n_seqs").cast("bigint").alias("n_seqs"),
            F.sum("src_tok").cast("bigint").alias("total_tok"),
            F.sum(
                F.col("n_seqs") * F.col("context_len") - F.col("src_tok")
            )
            .cast("bigint")
            .alias("pad_tokens"),
            F.round(
                F.sum("src_tok")
                * 1000000.0
                / (F.sum("n_seqs") * F.first("context_len"))
            )
            .cast("bigint")
            .alias("fill_ppm"),
            F.sum("n_over").cast("bigint").alias("n_oversize"),
            F.round(
                F.sum("n_over") * 1000000.0 / F.max("n_docs")
            )
            .cast("bigint")
            .alias("oversize_ppm"),
        )
        .select(
            F.col("context_len").cast("bigint").alias("context_len"),
            "n_seqs",
            "total_tok",
            "pad_tokens",
            "fill_ppm",
            "n_oversize",
            "oversize_ppm",
        )
        .orderBy("context_len")
    )


# --------------------------------------------------------------------------
# Quality-prune mix shift (round-12 original; the mix ledger of the
# per-language gate): chunk_decay_source_mix prices how DEDUP
# re-mixes the corpus; this is the same ledger for the perplexity
# gate — when each (lang, source) cell loses its bottom decile by LM
# score, token mass does not leave uniformly, so the post-gate
# source mix drifts from the raw mix. Per source: docs, pruned docs,
# raw and kept token mass, both shares, and the signed shift — the
# number a mixture planner must re-balance after quality filtering.
# Docs too short to score (under 2 tokens, no bigram) are never
# pruned and keep their mass, matching the production gate's
# pass-through for unscorable rows.
# Exact math: integer token sums; shares and shift are the final ppm
# roundings of exact integer ratios.
# Scale: the LM scoring shuffle is shared with the gate; the ledger
# adds one doc_id join and a source-domain rollup.
# --------------------------------------------------------------------------
_QPMS_ORACLE = f"""
    WITH {LM_SCORED_CTES}    tagged AS (
      SELECT d.lang, d.source, s.doc_id, s.score_e6,
             ROW_NUMBER() OVER (PARTITION BY d.lang, d.source
                                ORDER BY s.score_e6, s.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY d.lang, d.source) AS n_grp
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    cut AS (
      SELECT lang, source,
             MIN(CASE WHEN rn > n_grp * {_PPG_FRAC_PPM} // 1000000
                      THEN score_e6 END) AS exact_thresh_e6
      FROM tagged GROUP BY lang, source
    ),
    pruned AS (
      SELECT t.doc_id
      FROM tagged t JOIN cut c ON c.lang = t.lang
                               AND c.source = t.source
      WHERE t.score_e6 < c.exact_thresh_e6
    ),
    mass AS (
      SELECT d.source, d.doc_id,
             CAST(len({sql_tokens('text')}) AS BIGINT) AS tok,
             (p.doc_id IS NOT NULL) AS is_pruned
      FROM documents d LEFT JOIN pruned p ON p.doc_id = d.doc_id
    ),
    per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(count_if(is_pruned) AS BIGINT) AS n_pruned,
             CAST(SUM(tok) AS BIGINT) AS raw_tokens,
             CAST(SUM(CASE WHEN is_pruned THEN 0 ELSE tok END)
                  AS BIGINT) AS kept_tokens
      FROM mass GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(raw_tokens) AS BIGINT) AS t_raw,
             CAST(SUM(kept_tokens) AS BIGINT) AS t_kept
      FROM per
    )
    SELECT p.source, p.n_docs, p.n_pruned, p.raw_tokens, p.kept_tokens,
           CAST(ROUND(p.raw_tokens * 1000000.0 / t.t_raw) AS BIGINT)
             AS raw_share_ppm,
           CAST(ROUND(p.kept_tokens * 1000000.0 / t.t_kept) AS BIGINT)
             AS kept_share_ppm,
           CAST(ROUND(p.kept_tokens * 1000000.0 / t.t_kept)
                - ROUND(p.raw_tokens * 1000000.0 / t.t_raw) AS BIGINT)
             AS shift_ppm
    FROM per p CROSS JOIN tot t
    ORDER BY p.source
    """


def quality_prune_mix_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token-mix ledger of the per-(lang, source)
    perplexity gate: raw vs kept mass, shares, and the signed shift
    (see block comment)."""
    d = _docs(spark, sf_dir)
    scored = lm_doc_scores(d)
    tagged = scored.join(
        d.select("doc_id", "lang", "source"), "doc_id"
    ).select("lang", "source", "doc_id", "score_e6")
    ws = Window.partitionBy("lang", "source").orderBy(
        "score_e6", "doc_id"
    )
    ranked = tagged.select(
        "lang",
        "source",
        "doc_id",
        "score_e6",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang", "source"))
        .alias("n_grp"),
    )
    cut = ranked.groupBy("lang", "source").agg(
        F.min(
            F.when(
                F.col("rn")
                > F.floor(F.col("n_grp") * _PPG_FRAC_PPM / 1000000),
                F.col("score_e6"),
            )
        ).alias("exact_thresh_e6")
    )
    pruned = (
        ranked.join(F.broadcast(cut), ["lang", "source"])
        .filter(F.col("score_e6") < F.col("exact_thresh_e6"))
        .select("doc_id", F.lit(True).alias("is_pruned"))
    )
    mass = d.select(
        "source",
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("tok"),
    ).join(pruned, "doc_id", "left").select(
        "source",
        "tok",
        F.coalesce("is_pruned", F.lit(False)).alias("is_pruned"),
    )
    per = mass.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("is_pruned").cast("long"))
        .cast("bigint")
        .alias("n_pruned"),
        F.sum("tok").cast("bigint").alias("raw_tokens"),
        F.sum(F.when(F.col("is_pruned"), 0).otherwise(F.col("tok")))
        .cast("bigint")
        .alias("kept_tokens"),
    )
    tot = per.agg(
        F.sum("raw_tokens").cast("bigint").alias("t_raw"),
        F.sum("kept_tokens").cast("bigint").alias("t_kept"),
    )
    raw_share = F.round(
        F.col("raw_tokens") * 1000000.0 / F.col("t_raw")
    ).cast("bigint")
    kept_share = F.round(
        F.col("kept_tokens") * 1000000.0 / F.col("t_kept")
    ).cast("bigint")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_pruned",
            "raw_tokens",
            "kept_tokens",
            raw_share.alias("raw_share_ppm"),
            kept_share.alias("kept_share_ppm"),
            (kept_share - raw_share).alias("shift_ppm"),
        )
        .orderBy("source")
    )


ROUND13_STAGED: dict[str, tuple] = {
    "perplexity_gate_by_lang": (perplexity_gate_by_lang, _PPGL_ORACLE),
    "pack_padding_sweep": (pack_padding_sweep, _PAD_SWEEP_ORACLE),
    "quality_prune_mix_shift": (
        quality_prune_mix_shift,
        _QPMS_ORACLE,
    ),
}


# ==========================================================================
# ROUND-14 STAGED (ROADMAP §"Round 14+"; zero registry delta until the
# round-14 boundary). Aggregated by operators/staging.py STAGED.
# ==========================================================================

# --------------------------------------------------------------------------
# Post-gate mixture re-balancer (ROADMAP round-14 "Curation"):
# quality_prune_mix_shift proves the perplexity gate MOVES the
# per-source token mix; this op closes the loop the shift table
# motivates — re-run domain_mix_planner's uniform-rebalance weights
# on the POST-GATE corpus and report how much each source's sampling
# weight must move to keep the trained mixture on target after
# gating. Per source: kept docs and kept token mass (split-on-space,
# domain_mix_planner's mass convention; the GATE itself stays on the
# tokens() LM grid — the two conventions price different things and
# are both module-pinned), kept token share, the clamped uniform
# weight on the RAW corpus, the clamped uniform weight on the KEPT
# corpus, the signed weight shift, and the kept-side clamp flag.
# Pinned shape: weight_shift_ppm > 0 exactly for sources the gate cut
# HARDER than average (their kept mass shrank relative to the new
# uniform target), so the shift column is the re-balancing order a
# mixture owner actually applies.
# Exact math: the gate is the verified integer-grid bigram LM with
# exact discrete thresholds; weights are single-rounded doubles
# clamped at the module cap (domain_mix_planner's convention).
# Scale: the gate's two count joins + one (lang, source) rank, one
# doc_id-keyed anti-join, two source-domain rollups; weight algebra
# is |sources|-sized.
# --------------------------------------------------------------------------
_PGM_ORACLE = f"""
    WITH {LM_SCORED_CTES}    tagged AS (
      SELECT d.lang, d.source, s.doc_id, s.score_e6,
             ROW_NUMBER() OVER (PARTITION BY d.lang, d.source
                                ORDER BY s.score_e6, s.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY d.lang, d.source) AS n_grp
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id
    ),
    cut AS (
      SELECT lang, source,
             MIN(CASE WHEN rn > n_grp * {_PPG_FRAC_PPM} // 1000000
                      THEN score_e6 END) AS exact_thresh_e6
      FROM tagged GROUP BY lang, source
    ),
    pruned AS (
      SELECT t.doc_id
      FROM tagged t JOIN cut c ON c.lang = t.lang
                               AND c.source = t.source
      WHERE t.score_e6 < c.exact_thresh_e6
    ),
    raw_per AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    raw_tot AS (SELECT SUM(n_tokens) AS t, COUNT(*) AS s FROM raw_per),
    kept_per AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT)
               AS n_tokens
      FROM documents d LEFT JOIN pruned p ON p.doc_id = d.doc_id
      WHERE p.doc_id IS NULL
      GROUP BY d.source
    ),
    kept_tot AS (SELECT SUM(n_tokens) AS t, COUNT(*) AS s
                 FROM kept_per)
    SELECT k.source,
           k.n_docs AS n_docs_kept,
           k.n_tokens AS n_tokens_kept,
           CAST(ROUND(k.n_tokens * 1000000.0 / kt.t) AS BIGINT)
             AS token_share_kept_ppm,
           CAST(LEAST(
             ROUND((rt.t * 1.0 / rt.s) / r.n_tokens * 1000000.0),
             {_MIX_MAX_WEIGHT_PPM}) AS BIGINT) AS weight_raw_ppm,
           CAST(LEAST(
             ROUND((kt.t * 1.0 / kt.s) / k.n_tokens * 1000000.0),
             {_MIX_MAX_WEIGHT_PPM}) AS BIGINT) AS weight_kept_ppm,
           CAST(LEAST(
             ROUND((kt.t * 1.0 / kt.s) / k.n_tokens * 1000000.0),
             {_MIX_MAX_WEIGHT_PPM}) AS BIGINT)
           - CAST(LEAST(
             ROUND((rt.t * 1.0 / rt.s) / r.n_tokens * 1000000.0),
             {_MIX_MAX_WEIGHT_PPM}) AS BIGINT) AS weight_shift_ppm,
           ROUND((kt.t * 1.0 / kt.s) / k.n_tokens * 1000000.0)
             > {_MIX_MAX_WEIGHT_PPM} AS weight_clamped
    FROM kept_per k
    JOIN raw_per r ON r.source = k.source
    CROSS JOIN raw_tot rt CROSS JOIN kept_tot kt
    ORDER BY k.source
    """


def post_gate_mix_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Uniform-rebalance sampling weights recomputed on the post-
    perplexity-gate corpus, with the signed per-source weight shift
    vs the raw corpus (see block comment)."""
    d = _docs(spark, sf_dir)
    scored = lm_doc_scores(d)
    ws = Window.partitionBy("lang", "source").orderBy(
        "score_e6", "doc_id"
    )
    ranked = (
        scored.join(d.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "lang",
            "source",
            "doc_id",
            "score_e6",
            F.row_number().over(ws).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("lang", "source"))
            .alias("n_grp"),
        )
    )
    cut = ranked.groupBy("lang", "source").agg(
        F.min(
            F.when(
                F.col("rn")
                > F.floor(F.col("n_grp") * _PPG_FRAC_PPM / 1000000),
                F.col("score_e6"),
            )
        ).alias("th")
    )
    pruned = (
        ranked.join(F.broadcast(cut), ["lang", "source"])
        .filter(F.col("score_e6") < F.col("th"))
        .select("doc_id", F.lit(True).alias("is_pruned"))
    )
    mass = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("tok"),
    ).join(pruned, "doc_id", "left")
    raw_per = mass.groupBy("source").agg(
        F.sum("tok").cast("bigint").alias("r_tokens")
    )
    raw_tot = raw_per.agg(
        F.sum("r_tokens").alias("rt"), F.count(F.lit(1)).alias("rs")
    )
    kept_per = (
        mass.filter(F.col("is_pruned").isNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_kept"),
            F.sum("tok").cast("bigint").alias("k_tokens"),
        )
    )
    kept_tot = kept_per.agg(
        F.sum("k_tokens").alias("kt"), F.count(F.lit(1)).alias("ks")
    )
    raw_w = F.round(
        (F.col("rt") / F.col("rs")) / F.col("r_tokens") * 1000000.0
    )
    kept_w = F.round(
        (F.col("kt") / F.col("ks")) / F.col("k_tokens") * 1000000.0
    )
    raw_wc = F.least(raw_w, F.lit(_MIX_MAX_WEIGHT_PPM)).cast("bigint")
    kept_wc = F.least(kept_w, F.lit(_MIX_MAX_WEIGHT_PPM)).cast("bigint")
    return (
        kept_per.join(raw_per, "source")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(kept_tot))
        .select(
            "source",
            "n_docs_kept",
            F.col("k_tokens").alias("n_tokens_kept"),
            F.round(F.col("k_tokens") * 1000000.0 / F.col("kt"))
            .cast("bigint")
            .alias("token_share_kept_ppm"),
            raw_wc.alias("weight_raw_ppm"),
            kept_wc.alias("weight_kept_ppm"),
            (kept_wc - raw_wc).alias("weight_shift_ppm"),
            (kept_w > _MIX_MAX_WEIGHT_PPM).alias("weight_clamped"),
        )
        .orderBy("source")
    )


ROUND14_STAGED: dict[str, tuple] = {
    "post_gate_mix_rebalance": (post_gate_mix_rebalance, _PGM_ORACLE),
}
