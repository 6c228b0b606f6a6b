"""Doc-ID reordering for posting-list compression (SURVEY.md §2.4).

The reference's secondary pipeline (R1-R6,
/root/reference/component/doc_reordering/BlandfordBlelloch.cpp:20-465 —
studied, not copied) recursively bisects the corpus by tf-vector cosine
similarity so similar documents get adjacent docIDs, shrinking
delta-gaps in posting lists.

Two Spark-first re-expressions, cheap and faithful:

``reorder_by_content`` (cheap, one shuffle): sorting on a
locality-sensitive content key —

    new_doc_id = rank over (simhash_gray, old_doc_id)

where ``simhash_gray`` is the Gray-code of the tf-weighted SimHash
(Gray ordering makes Hamming-adjacent sketches sort adjacently). One
shuffle (the range sort), fully distributed, deterministic. The rank is
computed with the same partition-offset prefix-sum trick as
``corpus.assign_doc_ids`` — no single-partition window.

``reorder_bisect`` (faithful): the reference's actual algorithm shape —
recursive cosine bisection with per-side centroids — made
level-synchronous so every cluster at a depth splits in the same
constant number of Spark jobs (no driver-side recursion, no O(n²)
similarity graph), with the Gray sort as the within-leaf order.

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


def _unit_term_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, term, uw): L2-normalized tf vector per doc — the
    reference's get_term_vector + cosine denominator precomputed
    (BlandfordBlelloch.cpp:272-307, studied not copied)."""
    from .tokenizer import tokenize_col

    tf = (
        docs.select("doc_id", F.explode(tokenize_col(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("w"))
    )
    norm = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return tf.join(norm, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("norm")).alias("uw")
    )


def reorder_bisect(
    docs: DataFrame,
    depth: int = 4,
    iters: int = 2,
    centroid_terms: int = 256,
    leaf_bits: int = 16,
) -> DataFrame:
    """Recursive cosine bisection, the faithful re-expression of the
    reference's Blandford–Blelloch pipeline (R1-R6,
    BlandfordBlelloch.cpp:20-230: sample -> similarity graph ->
    2-way partition -> per-side center of mass -> assign every doc to
    the nearer centroid by cosine -> recurse).

    Spark-first shape: LEVEL-SYNCHRONOUS — every cluster at a level is
    split in the SAME jobs, vectorized by a ``path`` key (the bit
    string of splits so far), so the work per level is a constant
    number of shuffles regardless of cluster count:

    * seeds: per path, the docs with min/max md5(doc_id) (deterministic
      stand-in for the reference's rand() sample);
    * ``iters`` Lloyd rounds of 2-means under cosine: assign each doc
      to the higher-dot-product side (unit doc vectors x unit-scaled
      centroids), recompute each side's center of mass, truncated to
      the ``centroid_terms`` heaviest terms (bounds the join);
    * path extends by the winning side's bit; state is
      localCheckpoint-ed per level so lineage stays flat.

    Final ids: dense ranks over (path, simhash-Gray, orig_doc_id) — the
    Gray key orders docs *within* a leaf cluster, exactly the role the
    reference's recursion-to-singletons plays. Docs whose text has no
    terms keep sentinel keys and are preserved.

    Cost: depth x (iters+1) bounded shuffles over n_docs rows — no
    driver-side recursion, no O(n^2) graph, valid at any corpus size.
    """
    from .dedup import simhash

    state = docs.select("doc_id").withColumn("path", F.lit(0).cast("long"))
    tf = _unit_term_weights(docs.select("doc_id", "text")).persist()
    seed_h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    try:
        for _level in range(depth):
            tfp = tf.join(state, "doc_id")
            seeds = (
                state.withColumn("_h", seed_h)
                .groupBy("path")
                .agg(
                    F.min_by("doc_id", "_h").alias("d0"),
                    F.max_by("doc_id", "_h").alias("d1"),
                )
            )
            side_seeds = seeds.select(
                "path", F.explode(F.array(
                    F.struct(F.lit(0).alias("side"), F.col("d0").alias("doc_id")),
                    F.struct(F.lit(1).alias("side"), F.col("d1").alias("doc_id")),
                )).alias("s"),
            ).select("path", F.col("s.side").alias("side"), F.col("s.doc_id").alias("doc_id"))
            # unit seed vectors ARE the initial centroids
            cent = F.broadcast(side_seeds).join(tf, "doc_id").select(
                "path", "side", "term", F.col("uw").alias("cwn")
            )
            choice = None
            for _it in range(iters):
                scores = (
                    tfp.join(cent, ["path", "term"])
                    .groupBy("doc_id", "path", "side")
                    .agg(F.sum(F.col("uw") * F.col("cwn")).alias("s"))
                )
                # higher cosine wins; ties (and no-overlap docs, via the
                # left join below) deterministically take side 0
                choice = scores.groupBy("doc_id").agg(
                    F.max(F.struct(F.col("s"), (-F.col("side")).alias("ns")))
                    .alias("m")
                ).select("doc_id", (-F.col("m.ns")).cast("int").alias("side"))
                if _it == iters - 1:
                    break
                assigned = tfp.join(choice, "doc_id")
                sums = assigned.groupBy("path", "side", "term").agg(
                    F.sum("uw").alias("sw"), F.count("*").alias("_nt")
                )
                from pyspark.sql import Window

                w = Window.partitionBy("path", "side").orderBy(
                    F.desc("sw"), F.asc("term")
                )
                top = sums.withColumn("_r", F.row_number().over(w)).where(
                    F.col("_r") <= centroid_terms
                )
                cn = top.groupBy("path", "side").agg(
                    F.sqrt(F.sum(F.col("sw") * F.col("sw"))).alias("cn")
                )
                cent = top.join(cn, ["path", "side"]).select(
                    "path", "side", "term",
                    (F.col("sw") / F.col("cn")).alias("cwn"),
                )
            state = (
                state.join(choice, "doc_id", "left")
                .select(
                    "doc_id",
                    (
                        F.col("path") * 2 + F.coalesce(F.col("side"), F.lit(0))
                    ).alias("path"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        tf.unpersist()

    sh = simhash(docs.select("doc_id", "text"), bits=leaf_bits)
    gray = F.expr(
        "coalesce(simhash, 0L) ^ (coalesce(simhash, 0L) >> 1)"
    ).alias("leaf_key")
    keyed = (
        docs.join(state, "doc_id")
        .join(sh, "doc_id", "left")
        .select(
            F.col("doc_id").alias("orig_doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
            "path",
            gray,
        )
    )
    out = assign_doc_ids(keyed, order_col=["path", "leaf_key", "orig_doc_id"])
    return out.drop("path", "leaf_key")


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
