"""Text-analysis functions for training-data pipelines — all JVM-side
column expressions (whole-stage codegen; zero Python on the hot path) with
exact DuckDB-SQL twins for oracle verification.

- token/char counts, lexical-quality features (SURVEY.md 'quality scoring')
- stopword-lexicon language ID (n-gram/stopword heuristic)
- rolling polynomial document fingerprint (modular integer math — the
  order-sensitive analogue of the reference's content fingerprints,
  usearch/index.py:564-587)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iscc_search_spark.functions.hashing import MERSENNE_31, h32_expr
from iscc_search_spark.functions.textnorm import tokens_expr

# tiny fixed lexicons (frozen — shared with the DuckDB oracle SQL)
STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it"]
LANG_LEXICON = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "la", "et", "est"],
}

FP_BASE = 1_000_003
FP_MOD = MERSENNE_31


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_chars, uniq_ratio, stopword_ratio, avg_token_len,
    alnum_ratio, quality_score) — deterministic lexical quality features.

    The four token-derived counts (n_tokens, n_stop, token_chars, n_uniq)
    come from ONE Arrow-batched pass (tokenize_py == tokens_expr by
    contract; the counts are exact integers, so every derived double is
    bit-identical to the expression forms).  The expression pipeline this
    replaces tokenized per feature column and compiled a generated method
    large enough that every fresh run burned ~93 s of interpreter CPU
    before JIT caught up; a Python kernel has no such cliff and costs
    ~25 us/doc.  asNondeterministic stops the optimizer duplicating the
    UDF into its four consumers (guide §4.4); spread_small keeps
    few-row-group inputs off a handful of skewed scan tasks."""
    from iscc_search_spark.functions.textnorm import tokenize_py
    from iscc_search_spark.session import spread_small

    stopset = frozenset(STOPWORDS_EN)

    @F.pandas_udf(
        "n_tokens long, n_stop long, token_chars long, n_uniq long"
    )
    def tok_counts(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            toks = tokenize_py(t) if t is not None else []
            rows.append(
                (
                    len(toks),
                    sum(1 for x in toks if x in stopset),
                    sum(len(x) for x in toks),
                    len(set(toks)),
                )
            )
        return pd.DataFrame(
            rows, columns=["n_tokens", "n_stop", "token_chars", "n_uniq"]
        )

    tok_counts = tok_counts.asNondeterministic()

    base = spread_small(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select("doc_id", F.col(text_col), tok_counts(text_col).alias("_tc"))
    n_tokens = F.col("_tc.n_tokens")
    n_stop = F.col("_tc.n_stop")
    token_chars = F.col("_tc.token_chars")
    n_uniq = F.col("_tc.n_uniq")
    n_chars = F.length(text_col).cast("long")
    n_alnum = (
        n_chars - F.length(F.regexp_replace(F.lower(F.col(text_col)), "[0-9a-z]", ""))
    ).cast("long")
    out = base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (n_uniq.cast("double") / n_tokens.cast("double")).alias("uniq_ratio"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (token_chars.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (n_alnum.cast("double") / n_chars.cast("double")).alias("alnum_ratio"),
    )
    # simple frozen combination: informative docs score high
    return out.withColumn(
        "quality_score",
        F.col("uniq_ratio") * F.lit(0.5)
        + F.col("alnum_ratio") * F.lit(0.3)
        + (F.lit(1.0) - F.col("stopword_ratio")) * F.lit(0.2),
    )


def langid(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred) — stopword-count language heuristic.

    Ties break by language code ascending ('de' < 'en' < 'fr'); docs with
    zero lexicon hits predict 'und' (undetermined).
    """
    from iscc_search_spark.session import spread_small

    base = spread_small(
        docs.select(
            F.col(id_col).alias("doc_id"), tokens_expr(text_col).alias("_toks")
        )
    )
    toks = F.col("_toks")
    counts = {}
    for lang, words in LANG_LEXICON.items():
        # per-word tf via array_remove (codegen) — the interpreted HOF
        # filter cost ~1 us per token; word lists are distinct so the sum
        # equals the filter count exactly
        counts[lang] = sum(
            (F.size(toks) - F.size(F.array_remove(toks, w))) for w in words
        )
    best = F.greatest(*counts.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(counts["de"] == best, F.lit("de"))
        .when(counts["en"] == best, F.lit("en"))
        .otherwise(F.lit("fr"))
    )
    return base.select("doc_id", pred.alias("lang_pred"))


def fingerprint_expr(text_col: str | Column) -> Column:
    """Rolling polynomial hash over the token h32 sequence, mod 2^31-1.

    fp = fold(tokens, 0, (acc, t) -> (acc * FP_BASE + h32(t) mod M) mod M);
    order-sensitive (unlike simhash) so it distinguishes permutations.
    Products stay < 2^52 — exact in every engine's int64.
    """
    toks = tokens_expr(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_BASE) + h32_expr(t) % F.lit(FP_MOD))
        % F.lit(FP_MOD),
    )


def doc_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), fingerprint_expr(text_col).alias("fingerprint")
    )
