"""Index-build end-to-end: lexicon df, decoded posting lists, chunk
boundaries, resumability — all vs the pure-Python oracle."""

import os

import numpy as np
import pytest

from search_engine_spark import codecs
from search_engine_spark.build import IndexBuilder
from search_engine_spark.oracle import OracleIndex


def make_corpus():
    """Synthetic corpus exercising FIXTURES.md §1 requirements: tf>1,
    >128-posting term, empty doc, CJK + index-only delimiters."""
    docs = []
    for i in range(300):
        parts = ["common"]  # df=300 > 128 -> multi-chunk list
        if i % 2 == 0:
            parts += ["even", "even"]  # tf=2
        if i % 50 == 0:
            parts += ["rare@term!x"]  # index-side delims split this
        if i == 7:
            parts += ["你好，世界"]
        docs.append((i, " ".join(parts)))
    docs.append((300, ""))  # empty doc
    docs.append((301, " ,.; "))  # all-delimiters doc
    return docs


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = make_corpus()
    index_dir = str(tmp_path_factory.mktemp("idx"))
    df = spark.createDataFrame(
        [(d, f"https://x/{d}", t) for d, t in docs],
        "doc_id long, url string, text string",
    )
    manifest = IndexBuilder(
        spark, index_dir, n_salts=1, bucket_count=4
    ).build(df, resume=False)
    return docs, index_dir, manifest


def test_doc_table_and_stats(spark, built):
    import os

    from search_engine_spark.build import VIEW_MARKER, read_stage_parquet

    docs, index_dir, _ = built
    # doc_table is a zero-copy VIEW of the tokens stage (text/url are
    # never written twice); the marker records the source stage
    assert os.path.exists(f"{index_dir}/doc_table/{VIEW_MARKER}")
    doc_table = read_stage_parquet(spark, f"{index_dir}/doc_table", "doc_table")
    assert doc_table.columns == ["doc_id", "url", "doc_length", "text"]
    oracle = OracleIndex(docs)
    dt = {r["doc_id"]: r["doc_length"] for r in doc_table.collect()}
    assert dt == oracle.doc_lengths  # token counts incl. zero-term docs
    stats = spark.read.parquet(f"{index_dir}/stats").collect()[0]
    assert stats["n_docs"] == oracle.n_docs
    assert abs(stats["avgdl"] - oracle.avgdl) < 1e-9


def test_lexicon_df(spark, built):
    docs, index_dir, _ = built
    oracle = OracleIndex(docs)
    lex = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{index_dir}/lexicon").collect()
    }
    want = {t: oracle.df(t) for t in oracle.postings}
    assert lex == want
    # tokenizer asymmetry terms landed as expected
    assert "rare" in lex and "term" in lex and "x" in lex
    assert "你好" in lex and "世界" in lex


def test_chunk_layout_matches_reference_global_chunking(spark, built):
    """n_salts=1 build must be byte-identical to the oracle's reference
    chunking (128-aligned, delta+Simple9 payloads)."""
    docs, index_dir, _ = built
    oracle = OracleIndex(docs)
    rows = (
        spark.read.parquet(f"{index_dir}/chunks")
        .where("term = 'common'")
        .orderBy("salt", "chunk_seq")
        .collect()
    )
    want = oracle.chunks("common")
    assert len(rows) == len(want) == 3  # 300 postings / 128 -> 3 chunks
    for got, exp in zip(rows, want):
        assert got["n"] == exp["n"]
        assert got["first_doc_id"] == exp["first_doc_id"]
        assert got["last_doc_id"] == exp["last_doc_id"]
        assert got["codec"] == exp["codec"]
        assert bytes(got["payload"]) == exp["payload"]


def test_decoded_postings_match_oracle(spark, built):
    docs, index_dir, _ = built
    oracle = OracleIndex(docs)
    for term in ["even", "common", "你好"]:
        rows = (
            spark.read.parquet(f"{index_dir}/chunks")
            .where(f"term = '{term}'")
            .orderBy("salt", "chunk_seq")
            .collect()
        )
        ids, tfs = [], []
        for r in rows:
            i, t = codecs.decode_chunk(bytes(r["payload"]), r["codec"])
            ids += i.tolist()
            tfs += t.tolist()
        want = oracle.postings[term]
        assert list(zip(ids, tfs)) == want


def test_salted_build_equivalent(spark, built, tmp_path_factory):
    """n_salts=4 build decodes to the same posting lists (salt order ==
    doc-id order because salts are contiguous ranges)."""
    docs, index_dir, _ = built
    idx2 = str(tmp_path_factory.mktemp("idx_salted"))
    df = spark.createDataFrame(
        [(d, f"https://x/{d}", t) for d, t in docs],
        "doc_id long, url string, text string",
    )
    IndexBuilder(spark, idx2, n_salts=4, bucket_count=4).build(df, resume=False)
    for term in ["common", "even"]:
        rows = (
            spark.read.parquet(f"{idx2}/chunks")
            .where(f"term = '{term}'")
            .orderBy("salt", "chunk_seq")
            .collect()
        )
        ids = []
        for r in rows:
            i, _ = codecs.decode_chunk(bytes(r["payload"]), r["codec"])
            ids += i.tolist()
        assert ids == sorted(ids)
        assert ids == [d for d, _ in OracleIndex(docs).postings[term]]
        # salting actually split the hot list
        if term == "common":
            assert len({r["salt"] for r in rows}) == 4


def test_resume_skips_completed_stages(spark, built, tmp_path_factory):
    import json
    import shutil

    docs, _, _ = built
    idx = str(tmp_path_factory.mktemp("idx_resume"))
    df = spark.createDataFrame(
        [(d, f"https://x/{d}", t) for d, t in docs],
        "doc_id long, url string, text string",
    )
    b = IndexBuilder(spark, idx, n_salts=2, bucket_count=4)
    b.build(df, resume=False)
    lex_before = sorted(
        (r["term"], r["df"])
        for r in spark.read.parquet(f"{idx}/lexicon").collect()
    )
    tokens_mtime = os.path.getmtime(os.path.join(idx, "tokens", "_SUCCESS"))

    # simulate a crash after 'postings': wipe chunks+lexicon
    with open(os.path.join(idx, "_manifest.json")) as f:
        manifest = json.load(f)
    for stage in ("chunks", "lexicon"):
        shutil.rmtree(os.path.join(idx, stage))
        del manifest["stages"][stage]
    with open(os.path.join(idx, "_manifest.json"), "w") as f:
        json.dump(manifest, f)

    b.build(df, resume=True)
    lex_after = sorted(
        (r["term"], r["df"])
        for r in spark.read.parquet(f"{idx}/lexicon").collect()
    )
    assert lex_after == lex_before
    # earlier stages untouched
    assert os.path.getmtime(os.path.join(idx, "tokens", "_SUCCESS")) == tokens_mtime


def test_lineage_and_metrics(spark, built):
    _, index_dir, manifest = built
    assert set(manifest["stages"]) == {
        "tokens",
        "doc_table",
        "stats",
        "postings",
        "chunks",
        "lexicon",
    }
    for st, entry in manifest["stages"].items():
        assert entry["rows"] > 0
        assert entry["seconds"] >= 0
        assert entry["inputs"]
    lineage = spark.read.parquet(f"{index_dir}/lineage")
    per_stage = {
        r["stage"]: r["s"]
        for r in lineage.groupBy("stage").agg({"rows": "sum"}).withColumnRenamed("sum(rows)", "s").collect()
    }
    assert per_stage["lexicon"] == manifest["stages"]["lexicon"]["rows"]


def test_chunk_postings_arrays_equivalent(spark, built):
    """The array-packed encoder (JVM-side grouping) must produce the
    exact same chunk rows as the row-wise applyInPandas encoder."""
    from search_engine_spark.build import chunk_postings, chunk_postings_arrays

    _docs, index_dir, _m = built
    postings = spark.read.parquet(f"{index_dir}/postings")

    def rows(df):
        return sorted(
            (
                r["term"],
                r["salt"],
                r["chunk_seq"],
                r["first_doc_id"],
                r["last_doc_id"],
                r["n"],
                r["codec"],
                bytes(r["payload"]),
                bytes(r["dls"]),
            )
            for r in df.collect()
        )

    a = rows(chunk_postings(postings, 301, n_salts=4))
    b = rows(chunk_postings_arrays(postings, 301, n_salts=4))
    assert a == b and len(a) > 0


def test_chunk_tokens_docmajor_equivalent(spark, built):
    """The doc-major local-inversion encoder (default build path) must
    produce the exact same chunk rows as the exploded-row encoder."""
    from search_engine_spark.build import chunk_postings, chunk_tokens_docmajor

    _docs, index_dir, _m = built
    tokens = spark.read.parquet(f"{index_dir}/tokens")
    postings = spark.read.parquet(f"{index_dir}/postings")

    def rows(df):
        return sorted(
            (
                r["term"],
                r["salt"],
                r["chunk_seq"],
                r["first_doc_id"],
                r["last_doc_id"],
                r["n"],
                r["codec"],
                bytes(r["payload"]),
                bytes(r["dls"]),
            )
            for r in df.collect()
        )

    a = rows(chunk_postings(postings, 301, n_salts=4))
    b = rows(chunk_tokens_docmajor(tokens, 301, n_salts=4))
    assert a == b and len(a) > 0


def test_balance_scan_splits_widens_small_scans(spark, tmp_path):
    """A corpus far smaller than 128MB x 4 waves x cores must be split
    finer so the tokens scan fills every core for >=4 waves; the conf
    is restored after build() (query sessions keep the 128MB default
    that is right at data >> cluster scale)."""
    docs = spark.range(2000).selectExpr(
        "id as doc_id",
        "concat('doc://', id) as url",
        "concat('alpha beta gamma doc ', id) as text",
    )
    src = str(tmp_path / "corpus.parquet")
    docs.repartition(8).write.parquet(src)
    loaded = spark.read.parquet(src)

    from search_engine_spark.build import IndexBuilder

    b = IndexBuilder(spark, str(tmp_path / "idx"), n_salts=1, bucket_count=4)
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev = b._balance_scan_splits(loaded)
    try:
        assert prev == before  # returned for restore
        new = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        assert new < int(str(before).rstrip("b"))
        assert new >= 4 * 1024 * 1024
        fresh = spark.read.parquet(src)
        assert fresh.rdd.getNumPartitions() == 8  # one split per file
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)

    # full build restores the conf even though it shrank it internally
    b.build(loaded, resume=False)
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == before


def test_resume_rejects_config_drift(spark, built, tmp_path_factory):
    """Resuming with a config that contradicts the manifest must fail
    loudly: completed stages carry the OLD layout (bucket partitioning,
    chunk length), and mixing them with stages rebuilt under the new
    one silently breaks query-side bucket pruning."""
    docs, _, _ = built
    idx = str(tmp_path_factory.mktemp("idx_drift"))
    df = spark.createDataFrame(
        [(d, f"https://x/{d}", t) for d, t in docs],
        "doc_id long, url string, text string",
    )
    IndexBuilder(spark, idx, n_salts=2, bucket_count=4).build(
        df, resume=False
    )
    with pytest.raises(ValueError, match="contradicts"):
        IndexBuilder(spark, idx, n_salts=2, bucket_count=8).build(
            df, resume=True
        )
    # same config resumes fine (no-op: everything done)
    IndexBuilder(spark, idx, n_salts=2, bucket_count=4).build(
        df, resume=True
    )


def test_resume_invalidates_downstream_of_lost_stage(
    spark, built, tmp_path_factory
):
    """Losing an UPSTREAM stage must rerun everything after it: the
    completion markers of later stages are only trustworthy when the
    whole prefix is complete (a doc_table VIEW of re-tokenized docs
    over chunks encoding the old ones would silently misresolve)."""
    import json
    import shutil

    docs, _, _ = built
    idx = str(tmp_path_factory.mktemp("idx_inval"))
    df = spark.createDataFrame(
        [(d, f"https://x/{d}", t) for d, t in docs],
        "doc_id long, url string, text string",
    )
    b = IndexBuilder(spark, idx, n_salts=2, bucket_count=4)
    b.build(df, resume=False)
    chunks_mtime = os.path.getmtime(os.path.join(idx, "chunks", "_SUCCESS"))

    # lose the TOKENS stage only; chunks/lexicon markers stay on disk
    with open(os.path.join(idx, "_manifest.json")) as f:
        manifest = json.load(f)
    shutil.rmtree(os.path.join(idx, "tokens"))
    del manifest["stages"]["tokens"]
    with open(os.path.join(idx, "_manifest.json"), "w") as f:
        json.dump(manifest, f)

    b.build(df, resume=True)
    # chunks were rebuilt, not served stale
    assert os.path.getmtime(
        os.path.join(idx, "chunks", "_SUCCESS")
    ) > chunks_mtime
    # and the rebuilt index still answers
    from search_engine_spark.query import QueryEngine

    assert QueryEngine(spark, idx).search("common", k=3).count() > 0
