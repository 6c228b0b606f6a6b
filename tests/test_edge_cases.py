"""Degenerate inputs the 100 TB pipeline will inevitably see: empty
partitions of the corpus, single-doc corpora, punctuation-only docs,
and the optional positions layout."""

import shutil
import tempfile

import pytest

from search_engine_spark.build import IndexBuilder
from search_engine_spark.query import QueryEngine
from search_engine_spark.runtime import ensure_shipped


def _build(spark, rows, **kw):
    ensure_shipped(spark)
    d = tempfile.mkdtemp(prefix="seidx_edge_")
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    IndexBuilder(spark, d, bucket_count=4, **kw).build(docs, resume=False)
    return d


def test_empty_corpus_builds_and_queries(spark):
    d = _build(spark, [(0, "u", "x")])  # schema seed, then rebuild empty
    shutil.rmtree(d, ignore_errors=True)
    ensure_shipped(spark)
    d = tempfile.mkdtemp(prefix="seidx_empty_")
    docs = spark.createDataFrame(
        [], "doc_id long, url string, text string"
    )
    IndexBuilder(spark, d, bucket_count=4).build(docs, resume=False)
    qe = QueryEngine(spark, d)
    assert qe.n_docs == 0
    assert qe.search("anything", mode="disjunctive").collect() == []
    assert qe.search_local("anything") == []
    shutil.rmtree(d, ignore_errors=True)


def test_single_doc_and_punct_only_docs(spark):
    rows = [
        (0, "u0", "hello world hello"),
        (1, "u1", "!!! ... ???"),  # tokenizes to nothing
        (2, "u2", ""),
    ]
    d = _build(spark, rows)
    qe = QueryEngine(spark, d)
    assert qe.n_docs == 3  # doc table keeps all docs
    got = qe.search("hello", mode="conjunctive").collect()
    assert [r["doc_id"] for r in got] == [0]
    assert qe.search_local("hello") == [
        (got[0]["doc_id"], pytest.approx(got[0]["score"], rel=1e-5))
    ]
    shutil.rmtree(d, ignore_errors=True)


def test_positions_layout_builds_and_queries(spark):
    rows = [
        (i, f"u{i}", f"alpha beta gamma doc{i} alpha")
        for i in range(30)
    ]
    d = _build(spark, rows, store_positions=True)
    postings = spark.read.parquet(f"{d}/postings")
    assert "positions" in postings.columns
    r = (
        postings.where("term = 'alpha' and doc_id = 3")
        .select("positions")
        .collect()
    )
    assert r[0]["positions"] == [0, 4]  # both occurrences, in order
    # the chunked index over the positions layout still answers queries
    qe = QueryEngine(spark, d)
    top = qe.search("alpha doc3", mode="conjunctive").collect()
    assert [x["doc_id"] for x in top] == [3]
    shutil.rmtree(d, ignore_errors=True)
