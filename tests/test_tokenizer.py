"""Tokenizer golden tests vs the reference delimiter semantics
(/root/reference/component/HTMLParser.cpp:16-28,66-122;
QueryExecution.cpp:36-37,264-281)."""

import pandas as pd

from search_engine_spark.tokenizer import (
    tokenize_query,
    tokenize_series,
    tokenize_text,
)


def test_ascii_delims_index():
    assert tokenize_text("a,b.c;d:e?f[g]h{i}j(k)l-m/n+o*p&q^r\"s't") == list(
        "abcdefghijklmnopqrst"
    )
    # the extended index-only set
    assert tokenize_text("a@b!c#d%e>f<g|h~i") == list("abcdefghi")


def test_dollar_not_a_delimiter():
    # '$' sits in the reference's unicode set but is single-byte -> never a
    # delimiter in practice; we reproduce the quirk.
    assert tokenize_text("price$42 x") == ["price$42", "x"]


def test_unicode_delims():
    assert tokenize_text("你好，世界。end") == ["你好", "世界", "end"]
    assert tokenize_text("【标题】正文：内容") == ["标题", "正文", "内容"]
    # non-delimiter CJK runs stay whole (reference has no segmentation)
    assert tokenize_text("中文词 mixedLatin中文") == ["中文词", "mixedLatin中文"]


def test_no_lowercasing_and_counts():
    toks = tokenize_text("The THE the tHe")
    assert toks == ["The", "THE", "the", "tHe"]


def test_empty_and_all_delims():
    assert tokenize_text("") == []
    assert tokenize_text(None) == []
    assert tokenize_text(" ,.;\n") == []


def test_newline_is_delim():
    assert tokenize_text("line1\nline2") == ["line1", "line2"]


def test_query_tokenizer_smaller_set_and_dedup():
    # '@' etc are NOT query delimiters -> stay inside terms
    assert tokenize_query("a@b c") == ["a@b", "c"]
    assert tokenize_query("x,x.x y") == ["x", "y"]  # dedup + sorted
    assert tokenize_query("") == []


def test_series_matches_scalar():
    texts = [
        "a,b.c",
        "",
        None,
        " ,.;",
        "你好，世界",
        "price$42 x",
        "a@b!c",
        "multi  space\n\nnewline",
    ]
    got = tokenize_series(pd.Series(texts)).tolist()
    want = [tokenize_text(t) for t in texts]
    assert got == want


def test_spark_udf(spark):
    from search_engine_spark.tokenizer import register_udfs

    tokenize_udf = register_udfs()
    df = spark.createDataFrame(
        [(1, "a,b b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.toks
        for r in df.select("doc_id", tokenize_udf("text").alias("toks")).collect()
    }
    assert rows == {1: ["a", "b", "b"], 2: [], 3: []}
