"""Edge-case differential tests for the portable text primitives:
the same scalar expressions evaluated by Spark and DuckDB over
constructed adversarial inputs (empty, whitespace-only, unicode,
punctuation-only, digits, very long tokens)."""

from pyspark.sql import functions as F

from bigdataentrytask_spark.functions.text import (
    normalize_text,
    sql_normalize_text,
    sql_token_hash,
    sql_tokens,
    token_hash,
    tokens,
)

EDGE_TEXTS = [
    "",
    " ",
    "   \t\n  ",
    "hello world",
    "Hello, WORLD!!",
    "...!!!???",
    "12345 67890",
    "mixed123with456digits",
    "中文文本没有拉丁字母",
    "café naïve résumé",  # accented latin
    "a" * 500,
    "word " * 100,
    "UPPER lower MiXeD",
    "tab\tseparated\twords",
    "hyphen-ated under_scored dot.ted",
]


def _duck_rows(duck, expr_sql: str):
    import pandas as pd

    duck.register("edge_texts", pd.DataFrame({"txt": EDGE_TEXTS}))
    q = f"SELECT {expr_sql} AS v FROM edge_texts"
    return [r[0] for r in duck.execute(q).fetchall()]


def _spark_rows(spark, col):
    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "txt string")
    return [r.v for r in df.select(col.alias("v")).collect()]


def test_tokenizer_agrees_on_edges(spark, duck):
    got = _spark_rows(spark, tokens("txt"))
    want = _duck_rows(duck, sql_tokens("txt"))
    assert [list(g) for g in got] == [list(w) for w in want]


def test_normalize_agrees_on_edges(spark, duck):
    got = _spark_rows(spark, normalize_text("txt"))
    want = _duck_rows(duck, sql_normalize_text("txt"))
    assert got == want


def test_token_hash_agrees_on_edges(spark, duck):
    # hash each full text as if it were a token
    got = _spark_rows(spark, token_hash("txt"))
    want = _duck_rows(duck, sql_token_hash("txt"))
    assert got == want


def test_tokenizer_never_emits_empty(spark):
    got = _spark_rows(spark, tokens("txt"))
    for toks in got:
        assert "" not in list(toks)


def test_pii_scrub_redacts(spark, duck):
    """PII patterns actually redact, identically in both engines."""
    import pandas as pd

    from bigdataentrytask_spark.operators.text_analysis import (
        _sql_scrub,
        scrub_pii,
    )

    samples = [
        "contact me at john.doe+spam@example.co.uk today",
        "call +1-415-555-2671 or (415) 555 2671",
        "ssn 123-45-6789 leaked",
        "no pii here at all",
        "a@b.io and 987-65-4321 and +86 138 1234 5678",
    ]
    sdf = spark.createDataFrame([(t,) for t in samples], "txt string")
    got = [r.v for r in sdf.select(scrub_pii("txt").alias("v")).collect()]
    duck.register("pii_texts", pd.DataFrame({"txt": samples}))
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {_sql_scrub('txt')} FROM pii_texts"
        ).fetchall()
    ]
    assert got == want
    assert "<EMAIL>" in got[0] and "@" not in got[0]
    assert "<PHONE>" in got[1]
    assert "<SSN>" in got[2]
    assert got[3] == samples[3]
