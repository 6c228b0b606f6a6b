"""Doc-ID reordering for posting-list compression (SURVEY.md §2.4).

The reference's secondary pipeline (R1-R6,
/root/reference/component/doc_reordering/BlandfordBlelloch.cpp:20-465 —
studied, not copied) recursively bisects the corpus by tf-vector cosine
similarity so similar documents get adjacent docIDs, shrinking
delta-gaps in posting lists.

Spark-first re-expression: a recursive similarity bisection is a poor
fit for a 10^12-doc shuffle-based engine (driver-side recursion, O(n²)
graphs). The same objective — similar docs adjacent — is achieved by
sorting on a locality-sensitive content key:

    new_doc_id = rank over (simhash_gray, old_doc_id)

where ``simhash_gray`` is the Gray-code of the tf-weighted SimHash
(Gray ordering makes Hamming-adjacent sketches sort adjacently). One
shuffle (the range sort), fully distributed, deterministic. The rank is
computed with the same partition-offset prefix-sum trick as
``corpus.assign_doc_ids`` — no single-partition window.

``compression_stats`` measures the payoff: encoded chunk bytes before
vs after reordering on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .corpus import assign_doc_ids
from .dedup import simhash


def reorder_by_content(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Return ``docs`` with doc ids re-assigned in content-locality
    order. Input needs (doc_id, text [, ...]); all other columns are
    preserved; the old id is kept as ``orig_doc_id``."""
    sh = simhash(docs.select("doc_id", "text"), bits=bits)
    # LEFT join: simhash emits no row for docs whose text tokenizes to
    # zero terms (empty/punctuation-only); they must be KEPT, keyed by a
    # sentinel sketch of 0 so the corpus is preserved bit-for-bit
    # Gray code: adjacent sketches differ in one bit -> adjacent sort keys
    gray = F.expr(
        "coalesce(simhash, 0L) ^ (coalesce(simhash, 0L) >> 1)"
    ).alias("locality_key")
    keyed = docs.join(sh, "doc_id", "left").select(
        F.col("doc_id").alias("orig_doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
        gray,
    )
    out = assign_doc_ids(keyed, order_col=["locality_key", "orig_doc_id"])
    return out.drop("locality_key")


def compression_stats(spark, index_dir: str) -> dict:
    """Total encoded payload bytes + chunk count of a built index."""
    chunks = spark.read.parquet(f"{index_dir}/chunks")
    row = chunks.agg(
        F.sum(F.length("payload")).alias("payload_bytes"),
        F.sum(F.length("dls")).alias("dl_bytes"),
        F.count("*").alias("n_chunks"),
    ).collect()[0]
    return {
        "payload_bytes": int(row["payload_bytes"] or 0),
        "dl_bytes": int(row["dl_bytes"] or 0),
        "n_chunks": int(row["n_chunks"]),
    }
