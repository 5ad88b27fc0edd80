"""Pins for the shared word-splitter definition (ADVICE r11 #4).

``text.words`` (Column form) and ``text.words_sql`` (generated-SQL
fragment used by ``unigram.unigram_encode``) must tokenize
identically forever — a drift between them would silently
desynchronize encode-time tokenization from the training word table
and the fertility censuses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_implementation_spark.operators import text


ADVERSARIAL = [
    "Plain words here",
    "  leading and trailing   ",
    "tabs\tand\nnewlines\r\nmixed\x0bvertical\x0cfeed",
    "UPPER Mixed lower",
    "punct, stays! attached?  (parens) [brackets]",
    "",
    "   ",
    "single",
    "unicode café naïve 中文 control",
    "a  b   c    d",
    None,
]


def test_words_sql_fragment_matches_words(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, text string")
    out = df.select(
        "i",
        text.words("text").alias("col_form"),
        F.expr(text.words_sql("text")).alias("sql_form"),
    )
    mismatches = out.filter(
        ~(
            F.col("col_form").eqNullSafe(F.col("sql_form"))
        )
    ).collect()
    assert not mismatches, mismatches


def test_unigram_encode_uses_shared_fragment():
    """unigram_encode's generated expression must embed the rendered
    words_sql fragment verbatim (not an inline re-implementation)."""
    import inspect

    from data_warehouse_implementation_spark.operators import unigram

    src = inspect.getsource(unigram.unigram_encode)
    assert "words_sql(text_col)" in src
    assert "split(lower" not in src  # no inline splitter copy
