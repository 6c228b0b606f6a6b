"""The full training-data curation pipeline composed end-to-end over
one corpus, each stage feeding the next — the operators are hash-
oracled individually in the driver contract; this proves they CHAIN
(schemas line up, survivors flow through, nothing recomputes the
corpus from scratch mid-pipe):

    url dedup -> PII redaction -> span-level dedup (text rewrite) ->
    quality/langid/LM-score gating -> exact dedup ->
    fuzzy (LSH) dedup clustering -> semantic (embedding) dedup ->
    benchmark decontamination -> stratified sampling -> index build
    -> BM25 query over the curated corpus.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark import ann, dedup, textstats
from search_engine_spark.build import IndexBuilder
from search_engine_spark.corpus import load_documents
from search_engine_spark.query import QueryEngine
from search_engine_spark.runtime import ensure_shipped

from conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    ensure_shipped(spark)
    return load_documents(spark, SF_DIR).cache()


def test_curation_pipeline_composes(spark, corpus, tmp_path_factory):
    n0 = corpus.count()

    # 1. url-level dedup: keep each group's min-doc_id survivor
    url_keep = textstats.url_dedup(corpus).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs = corpus.join(url_keep, "doc_id").localCheckpoint()
    n1 = docs.count()
    assert 0 < n1 <= n0

    # 2. PII redaction rewrites text in place
    red = textstats.pii_redact(docs).withColumnRenamed("text", "red_text")
    docs = (
        docs.drop("text")
        .join(red, "doc_id")
        .withColumnRenamed("red_text", "text")
        .localCheckpoint()  # truncate lineage between passes, as a real
        # multi-stage pipeline would persist between jobs
    )
    assert docs.count() == n1

    # 2b. span-level dedup REWRITES text: cross-doc duplicated 5-gram
    # spans are masked out; fully-boilerplate docs drop entirely
    spans = dedup.span_dedup(docs, n=5, min_dup=2)
    docs = (
        docs.drop("text")
        .join(spans.select("doc_id", "clean_text"), "doc_id")
        .withColumnRenamed("clean_text", "text")
        .where(F.length(F.trim("text")) > 0)
        .localCheckpoint()
    )
    n2 = docs.count()
    assert 0 < n2 <= n1

    # 3. quality + langid + LM-surprisal gates (loose thresholds:
    # keep most, drop some)
    q = textstats.quality_score(docs)
    lang = textstats.language_id(docs)
    lm = textstats.lm_score(docs)
    keep = (
        q.join(lang, "doc_id")
        .join(lm.select("doc_id", "lm_score"), "doc_id")
        .where(
            (F.col("n_tokens") >= 3)
            & (F.col("ascii_ratio") > 0.5)
            & (F.col("lm_score") < 20.0)
        )
        .select("doc_id")
    )
    docs = docs.join(keep, "doc_id").localCheckpoint()
    n3 = docs.count()
    assert 0 < n3 <= n2

    # 4. exact dedup
    exact = dedup.exact_duplicates(docs).where(~F.col("is_dup")).select(
        "doc_id"
    )
    docs = docs.join(exact, "doc_id").localCheckpoint()
    n4 = docs.count()
    assert 0 < n4 <= n3

    # 5. fuzzy dedup: LSH pairs -> clusters -> keep survivors
    pairs = dedup.lsh_candidate_pairs(docs)
    clusters = dedup.dedup_clusters(docs, pairs)
    docs = docs.join(
        clusters.where("is_survivor").select("doc_id"), "doc_id"
    ).localCheckpoint()
    n5 = docs.count()
    assert 0 < n5 <= n4

    # 5b. semantic dedup in embedding space (vec_id == doc_id in the
    # driver testdata), scoped to the SURVIVING docs so the keep rule
    # always retains a representative that is actually still in the
    # pipe; kmeans codebook seeds from the smallest surviving ids
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    sem = ann.semantic_dedup(
        emb, tau=0.4, codebook=ann.kmeans_codebook(emb, n_cells=8, n_iter=2)
    )
    docs = docs.join(
        sem.where("is_dup").select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    ).localCheckpoint()
    n5b = docs.count()
    assert 0 < n5b <= n5

    # 6. benchmark decontamination: flag docs overlapping a "benchmark"
    # carved from the corpus itself (guaranteed hits), drop them
    bench = corpus.limit(5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    contam = dedup.decontaminate(docs, bench, shingle_n=5)
    docs = docs.join(
        contam.select("doc_id").distinct(), "doc_id", "left_anti"
    ).localCheckpoint()
    n6 = docs.count()
    assert 0 < n6 <= n5b

    # 7. deterministic stratified rebalance on lang
    sample = textstats.stratified_sample(docs, strat_col="lang")
    docs = docs.join(sample.select("doc_id"), "doc_id").localCheckpoint()
    n7 = docs.count()
    assert 0 < n7 <= n6

    # 8. index + query the curated corpus
    d = str(tmp_path_factory.mktemp("idx_pipe"))
    IndexBuilder(spark, d, n_salts=2, bucket_count=4).build(
        docs.select("doc_id", "url", "text"), resume=False
    )
    qe = QueryEngine(spark, d)
    assert qe.n_docs == n7
    top = qe.search("data table row", mode="disjunctive", k=10).collect()
    assert 0 < len(top) <= 10
    kept = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert {r["doc_id"] for r in top} <= kept
