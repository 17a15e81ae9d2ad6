"""Tokenizer spec tests — literal expected values, in the style of the
reference's literal known-answer tests (tests/test_usearch_search.py:122-167)."""

from pyspark.sql import functions as F

from iscc_search_spark.functions.textnorm import (
    extract_text_udf,
    tokenize_py,
    tokens_expr,
)

CASES = [
    ("Hello, World!", ["hello", "world"]),
    ("  a--b__c  ", ["a", "b", "c"]),
    ("", []),
    ("...", []),
    ("MiXeD123case x9", ["mixed123case", "x9"]),
    ("café naïve", ["caf", "na", "ve"]),  # non-ascii splits
]


def test_tokenize_py_literals():
    for text, want in CASES:
        assert tokenize_py(text) == want, text
    # NFC: e + combining acute -> é (single char, non-ascii, splits)
    assert tokenize_py("étude") == ["tude"]


def test_tokens_expr_matches_python_on_ascii(spark):
    texts = [c[0] for c in CASES if c[0].isascii()]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(tokens_expr("text").alias("toks")).collect()
    for row, text in zip(got, texts):
        assert row["toks"] == tokenize_py(text), text


def test_tokenizer_parity_full_corpus(spark, pages_df):
    """tokens_expr == tokenize_py token-for-token on every corpus doc."""
    rows = (
        pages_df.select("url", "text", tokens_expr("text").alias("toks"))
        .collect()
    )
    for r in rows:
        assert r["toks"] == tokenize_py(r["text"]), r["url"]


def test_extract_text_roundtrip(spark, pages_df):
    """input_hint invariant: extracting text from html reproduces `text`
    byte-identically per url, for every row."""
    bad = (
        pages_df.withColumn("ex", extract_text_udf("html"))
        .filter(F.col("ex") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_uri_template_expansion_parity(spark):
    """F8: JVM replace-chain == single-node twin (reference
    aggregator/entry.py:25-51 semantics: prefix-strip + lowercase for ISCC
    values, {/var} and {.var} operator forms, plain URLs pass through)."""
    from pyspark.sql import functions as F

    from iscc_search_spark.functions.uritemplate import (
        expand_gateway_expr,
        expand_gateway_py,
    )

    rows = [
        ("https://g.test/{iscc_code}", "ISCC:MAACX", "ISCC:KACTY", "abcd01"),
        ("https://g.test{/iscc_id}", "ISCC:MAACX", "ISCC:KACTY", "abcd01"),
        ("https://g.test/o{.datahash}", "ISCC:MAACX", "ISCC:KACTY", "abcd01"),
        ("https://plain.test/url", "ISCC:A", "ISCC:B", "ff"),
        ("{iscc_id}/{iscc_code}{.datahash}", "ISCC:AAA", "ISCC:BBB", "cc"),
    ]
    df = spark.createDataFrame(rows, "t string, iid string, icode string, dh string")
    got = [
        r["u"]
        for r in df.select(
            expand_gateway_expr("t", "iid", "icode", "dh").alias("u")
        ).collect()
    ]
    want = [expand_gateway_py(*r) for r in rows]
    assert got == want
    assert got[3] == "https://plain.test/url"
    assert got[0] == "https://g.test/kacty"
