"""Approximate-nearest-neighbor search over embedding columns.

Two paths, both pure DataFrame-API:

* :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set against the full vector table, `zip_with`/`aggregate` dot product
  (JVM-side, no Python), per-query top-k via window rank. Cost O(Q·N) —
  the correctness baseline, and actually the right plan when Q is small.
* :func:`ivf_topk` — IVF (inverted-file) scale path: a deterministic
  codebook (by default the vectors with the k smallest ids — engine-
  reproducible; :func:`kmeans_codebook` trains a spherical-k-means
  codebook for production recall), each vector
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
    # per-vector norms hoisted out of the Q x N pair expression
    queries_n = queries.withColumn("_qnorm", _norm(F.col("qe")))
    emb_n = emb.withColumn("_enorm", _norm(F.col(vec_col)))
    cos = _dot(F.col("q.qe"), F.col(f"e.{vec_col}")) / (
        F.col("q._qnorm") * F.col("e._enorm")
    )
    pairs = (
        F.broadcast(queries_n.alias("q"))
        .crossJoin(emb_n.alias("e"))
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


def kmeans_codebook(
    emb: DataFrame,
    n_cells: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means codebook via Lloyd iterations, DataFrame-native.

    Seeds from the ``n_cells`` SMALLEST ids (TakeOrdered — works for
    sparse or non-zero-based id spaces, unlike the contract's
    ``default_codebook`` whose ``id < n_cells`` predicate assumes dense
    ids; clamps ``n_cells`` to the vector count when the input is
    smaller), then repeats:
    assign every vector to its max-cosine centroid (broadcast join +
    ``max_by`` hash agg — no window sort), recompute each centroid as
    the element-wise mean of its members (``posexplode`` +
    ``groupBy(cell, pos).avg`` — map-side partial agg, so the shuffle
    carries n_cells*dims rows, not N*dims). Centroids are collected to
    the driver each iteration (n_cells*dims floats — tiny) and
    re-broadcast, keeping the lineage flat; this is the same structure
    MLlib's KMeans uses. Cells that lose all members keep their previous
    centroid. Returns (cell:int, cv:array<double>).

    The driver-contract IVF query stays on the deterministic seed
    codebook (oracle-reproducible); this trainer is the production
    quality path — recall payoff measured in tests/test_dedup_ann.py.
    """
    spark = emb.sparkSession
    # probe and seed over NON-NULL vectors only: an arbitrary first
    # row with a null embedding used to silently skip training (and a
    # null seed row produced a NULL centroid)
    trainable = emb.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    )
    dims_row = trainable.select(F.size(vec_col).alias("d")).first()
    if dims_row is None or dims_row["d"] is None:
        return default_codebook(emb, n_cells, id_col, vec_col)
    dims = int(dims_row["d"])
    seed_rows = (
        trainable.select(id_col, vec_col)
        .orderBy(F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    if len(seed_rows) < n_cells:
        # Degrade gracefully (consistent with the empty/dim-less
        # fallback above): clamp the codebook to the vector count —
        # a k-means with k > N has at most N distinct centroids anyway.
        if not seed_rows:
            return default_codebook(emb, n_cells, id_col, vec_col)
        n_cells = len(seed_rows)
    cents = {
        i: [float(x) for x in r[vec_col]] for i, r in enumerate(seed_rows)
    }
    base = trainable.select(id_col, vec_col)
    for _ in range(max(0, n_iter)):
        cb = spark.createDataFrame(
            [(c, v) for c, v in sorted(cents.items())], "cell int, cv array<double>"
        )
        assigned = assign_cells(base, cb, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.col("pm.m").alias("mv"))
        )
        moved = False
        for r in means.collect():
            v = [float(x) for x in r["mv"]]
            nrm = sum(x * x for x in v) ** 0.5
            if nrm > 0 and len(v) == dims:
                v = [x / nrm for x in v]
                if v != cents.get(int(r["cell"])):
                    moved = True
                cents[int(r["cell"])] = v
        if not moved:
            break
    return spark.createDataFrame(
        [(c, v) for c, v in sorted(cents.items())], "cell int, cv array<double>"
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
    # norms once per vector / per centroid, NOT per (vector, centroid)
    # pair: the O(dims) aggregate used to rerun n_cells times per row
    emb_n = emb.withColumn("_vnorm", _norm(F.col(vec_col)))
    cb_n = codebook.withColumn("_cnorm", _norm(F.col("cv")))
    cos = _dot(F.col(f"e.{vec_col}"), F.col("c.cv")) / (
        F.col("e._vnorm") * F.col("c._cnorm")
    )
    scored = (
        emb_n.alias("e")
        .crossJoin(F.broadcast(cb_n.alias("c")))
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


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 16,
    tau: float = 0.97,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space near-duplicate
    removal scoped to k-means cells — cluster the corpus, then compare
    vectors pairwise ONLY within their cell and drop all but one
    representative of every cos >= ``tau`` group. The cell scoping is
    what makes semantic dedup tractable: the quadratic pair cost is
    per-CELL (paper: 50k clusters over LAION), not per-corpus. No
    reference counterpart (LLM-pipeline extension).

    Deterministic keep rule: a vector is a duplicate iff a SMALLER-id
    vector in its cell is cos >= ``tau`` similar (same min-id
    canonical convention as :func:`dedup.exact_duplicates`; the
    paper's farthest-from-centroid rule is a one-line swap of the
    ``min`` key and trades reproducibility for marginal quality).
    Pairwise cosines are rounded to 4 dp before the threshold so the
    predicate is reproducible across engines.

    Returns one row per vector: (vec_id, cell, dup_of, is_dup) where
    ``dup_of`` is the smallest qualifying smaller id (null when kept).
    Plan shape at 10^9 vectors: centroids broadcast for assignment
    (max_by hash-agg, no window), the self-join shuffles both sides
    once on ``cell``, and per-task memory is bounded by cell size —
    size ``n_cells`` ~ N/10k so cells stay cache-sized, and AQE
    skew-splits any hot cell. ``codebook=None`` uses the
    deterministic first-ids codebook (engine-reproducible, used by
    the contract oracle); pass :func:`kmeans_codebook` output for
    production recall."""
    if codebook is None:
        codebook = default_codebook(emb, n_cells, id_col, vec_col)
    slim = emb.select(id_col, vec_col)
    # the assignment feeds both self-join sides AND the final left
    # join — persist so the broadcast-assign runs once, not three times
    from pyspark import StorageLevel

    a = assign_cells(slim, codebook, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cos = _dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}")) / (
        _norm(F.col(f"x.{vec_col}")) * _norm(F.col(f"y.{vec_col}"))
    )
    dup = (
        a.alias("x")
        .join(
            a.alias("y"),
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col(f"y.{id_col}") < F.col(f"x.{id_col}")),
        )
        .where(F.round(cos, 4) >= tau)
        .groupBy(F.col(f"x.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"y.{id_col}")).alias("dup_of"))
    )
    return (
        a.join(dup, id_col, "left")
        .select(
            id_col,
            "cell",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )
