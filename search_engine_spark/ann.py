"""Approximate-nearest-neighbor search over embedding columns.

Two paths, both pure DataFrame-API:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set against the full vector table, `zip_with`/`aggregate` dot product
  (JVM-side, no Python), per-query top-k via window rank. Cost O(Q·N) —
  the correctness baseline, and actually the right plan when Q is small.
* :func:`ivf_topk` — IVF (inverted-file) scale path: a deterministic
  codebook (by default the vectors with the k smallest ids — engine-
  reproducible; swap in KMeans centroids for production), each vector
  assigned to its nearest centroid cell, queries probe the ``nprobe``
  nearest cells; exact cosine within probed cells. Cost O(Q·N·nprobe/
  n_cells) after the one-off O(N·n_cells) assignment, which is itself a
  broadcast join (centroids are tiny).

At 100 TB the assignment output is written once (partitioned BY cell,
like our postings-by-bucket layout) so queries prune cells at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm(col):
    return F.sqrt(
        F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries``: (query_id, qe:array). Self-matches (query_id ==
    neighbor id) are excluded. Returns (query_id, neighbor_id, cos, rank).
    """
    cos = _dot(F.col("q.qe"), F.col(f"e.{vec_col}")) / (
        _norm(F.col("q.qe")) * _norm(F.col(f"e.{vec_col}"))
    )
    pairs = (
        F.broadcast(queries.alias("q"))
        .crossJoin(emb.alias("e"))
        .where(F.col(f"e.{id_col}") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col(f"e.{id_col}").alias("neighbor_id"),
            F.round(cos, 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return pairs.withColumn("rank", F.row_number().over(w).cast("int")).where(
        F.col("rank") <= k
    )


def default_codebook(
    emb: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic codebook: the ``n_cells`` vectors with smallest ids.
    (Reproducible in any engine; production would use KMeans.fit here.)"""
    return emb.where(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("int").alias("cell"), F.col(vec_col).alias("cv")
    )


def assign_cells(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max cosine) cell per vector: broadcast join +
    ``max_by`` hash aggregation (NOT a window — a row_number over
    N*n_cells rows is a full sort shuffle; the hash-agg computes the
    same argmax with map-side partial aggregation). Ties break
    deterministically: highest cosine, then lowest cell id. Returns emb
    columns + ``cell``."""
    cos = _dot(F.col(f"e.{vec_col}"), F.col("c.cv")) / (
        _norm(F.col(f"e.{vec_col}")) * _norm(F.col("c.cv"))
    )
    scored = (
        emb.alias("e")
        .crossJoin(F.broadcast(codebook.alias("c")))
        .select("e.*", F.col("c.cell"), cos.alias("_ccos"))
    )
    payload = [c for c in emb.columns if c != id_col] + ["cell"]
    best = scored.groupBy(F.col(id_col)).agg(
        F.max_by(
            F.struct(*payload),
            F.struct(
                F.col("_ccos").alias("c"), (-F.col("cell")).alias("nc")
            ),
        ).alias("_best")
    )
    return best.select(id_col, *[F.col(f"_best.{c}").alias(c) for c in payload])


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest cells per
    query, exact cosine inside. Returns (query_id, neighbor_id, cos, rank).
    """
    if codebook is None:
        codebook = default_codebook(emb, n_cells, id_col, vec_col)
    assigned = assign_cells(emb, codebook, id_col, vec_col)

    qcos = _dot(F.col("q.qe"), F.col("c.cv")) / (
        _norm(F.col("q.qe")) * _norm(F.col("c.cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_qcos"), F.asc("cell"))
    probes = (
        queries.alias("q")
        .crossJoin(F.broadcast(codebook.alias("c")))
        .select("q.query_id", "q.qe", F.col("c.cell"), qcos.alias("_qcos"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .drop("_rn", "_qcos")
    )

    cos = _dot(F.col("p.qe"), F.col(f"a.{vec_col}")) / (
        _norm(F.col("p.qe")) * _norm(F.col(f"a.{vec_col}"))
    )
    pairs = (
        F.broadcast(probes.alias("p"))
        .join(assigned.alias("a"), "cell")
        .where(F.col(f"a.{id_col}") != F.col("p.query_id"))
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col(f"a.{id_col}").alias("neighbor_id"),
            F.round(cos, 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return pairs.withColumn("rank", F.row_number().over(w).cast("int")).where(
        F.col("rank") <= k
    )
