"""Tokenizer golden tests vs the reference delimiter semantics
(/root/reference/component/HTMLParser.cpp:16-28,66-122;
QueryExecution.cpp:36-37,264-281)."""

import pandas as pd
from pyspark.sql import functions as F

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
        # non-delimiter whitespace at token edges (tab/CR/NBSP are NOT
        # reference delimiters; a bare .strip() once ate them)
        "\tfoo", "\t", "foo\r", "a\tb c", "\u00a0word\u00a0", "a \t b",
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


def test_jvm_tokenize_col_matches_python(spark):
    """tokenize_col (JVM split+filter) must be token-identical to the
    Python/pandas tokenizers, including the '$'-not-a-delimiter quirk,
    unicode delimiters, empty/None/all-delimiter docs."""
    from search_engine_spark.tokenizer import tokenize_col

    texts = [
        "a,b.c", "", None, " ,.;", "你好，世界", "price$42 x", "a@b!c",
        "multi  space\n\nnewline", ",.lead", "trail;,", "「quoted」term",
        "\tfoo", "foo\r", "a\tb c", "\u00a0word\u00a0", "a \t b",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.toks
        for r in df.select(
            "doc_id", tokenize_col(F.col("text")).alias("toks")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert rows[i] == tokenize_text(t or ""), repr(t)


def test_jvm_unique_tf_cols_matches_counter(spark):
    from collections import Counter

    from search_engine_spark.tokenizer import tokenize_col, unique_tf_cols

    texts = ["b a b a b c", "", None, "x", ",.;", "z z z z"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    srt = F.array_sort(tokenize_col(F.col("text")))
    ut, tf = unique_tf_cols(F.col("_srt"))
    got = {
        r.doc_id: dict(zip(r.u, r.f))
        for r in df.select("doc_id", srt.alias("_srt"))
        .select("doc_id", ut.alias("u"), tf.alias("f"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == dict(Counter(tokenize_text(t or ""))), repr(t)


# ------------------------- TREC extractor golden vectors (round 4) ---
# Fixed inputs -> exact extracted bytes, locking the input_hint's
# byte-identical-per-url invariant to the reference state machine
# (HTMLParser.cpp:21-131) before any raw TREC corpus shows up.

TREC_SAMPLE = """<DOC>
<DOCNO>WT01-B01-1</DOCNO>
<TEXT>
http://example.com/a

Line one, with <b>markup kept verbatim</b> & entities &amp; all.
  indented line with trailing spaces   
</TEXT>
</DOC>

<DOC>trailing junk after tag is legal
<DOCNO>WT01-B01-2</DOCNO>
<TEXT>
http://example.com/b
</TEXT>
</DOC>
"""


def test_trec_extractor_golden_vectors():
    from search_engine_spark.corpus import iter_trec_docs

    docs = list(iter_trec_docs(TREC_SAMPLE.splitlines()))
    assert [d["url"] for d in docs] == [
        "http://example.com/a",
        "http://example.com/b",
    ]
    # blank line inside <TEXT> skipped; markup NOT stripped; per-line
    # trailing spaces preserved; '\n' appended per content line
    assert docs[0]["text"] == (
        "Line one, with <b>markup kept verbatim</b> & entities &amp; all.\n"
        "  indented line with trailing spaces   \n"
    )
    # url-only document: empty content
    assert docs[1]["text"] == ""


def test_trec_extractor_rejects_malformed():
    import pytest as _pytest

    from search_engine_spark.corpus import iter_trec_docs

    with _pytest.raises(ValueError, match="expected <DOCNO>"):
        list(iter_trec_docs(["<DOC>", "<TEXT>", "x", "</TEXT>", "</DOC>"]))
    with _pytest.raises(ValueError, match="expected <DOC>"):
        list(iter_trec_docs(["hello"]))


def test_trec_spark_source_byte_identity(spark, tmp_path):
    """load_trec through the Arrow-batched Spark path must produce the
    same bytes as the pure-python state machine (two files -> file-count
    parallelism)."""
    from search_engine_spark.corpus import iter_trec_docs, load_trec

    p1 = tmp_path / "a.trec"
    p1.write_text(TREC_SAMPLE)
    p2 = tmp_path / "b.trec"
    p2.write_text(
        "<DOC>\n<DOCNO>X</DOCNO>\n<TEXT>\nhttp://example.com/c\n"
        "second file content\n</TEXT>\n</DOC>\n"
    )
    df = load_trec(spark, str(tmp_path))
    got = {r["url"]: r["text"] for r in df.collect()}
    want = {}
    for p in (p1, p2):
        for d in iter_trec_docs(p.read_text().splitlines()):
            want[d["url"]] = d["text"]
    assert got == want
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_arrow_tokenize_count_twin_matches_python():
    """build._tokenize_count_batches (the Arrow fallback for the JVM
    tokens stage) must produce the same (doc_length, uterms, utfs) as
    the pure-Python tokenizer — including whitespace-edge tokens and
    empty/None docs — or a future environment switching to it would
    build a divergent index."""
    from collections import Counter

    import pandas as pd

    from search_engine_spark.build import _tokenize_count_batches

    texts = [
        "a,b.c b a", "", None, " ,.;", "你好，世界 你好",
        "price$42 x", "\tfoo bar\tfoo", "a \t b", " word ",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "url": [f"u{i}" for i in range(len(texts))],
            "text": texts,
        }
    )
    (out,) = list(_tokenize_count_batches([pdf]))
    for i, t in enumerate(texts):
        toks = tokenize_text(t or "")
        assert out["doc_length"][i] == len(toks), repr(t)
        got = dict(zip(out["uterms"][i], out["utfs"][i]))
        assert got == dict(Counter(toks)), repr(t)


def test_trec_crlf_keeps_carriage_returns():
    """Reference getline strips only \\n: CRLF content keeps its \\r,
    and a lone-\\r line is NON-empty (it becomes the url/content line,
    never a skipped blank) — the byte-identity contract for CRLF
    corpora."""
    from search_engine_spark.corpus import iter_trec_docs

    lines = [
        "<DOC>\r", "<DOCNO>d1</DOCNO>\r", "<TEXT>\r",
        "http://u\r", "body line\r", "</TEXT>\r", "</DOC>\r",
    ]
    (doc,) = list(iter_trec_docs(lines))
    assert doc["url"] == "http://u\r"
    assert doc["text"] == "body line\r\n"
    # lone \r inside TEXT is content, not a blank
    lines2 = [
        "<DOC>", "<DOCNO>d2</DOCNO>", "<TEXT>",
        "\r", "real", "</TEXT>", "</DOC>",
    ]
    (doc2,) = list(iter_trec_docs(lines2))
    assert doc2["url"] == "\r" and doc2["text"] == "real\n"
