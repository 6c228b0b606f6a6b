#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., ...extras}.

--build-only : only the index build (used by --scaling subprocesses).
--scaling    : N vs 4N evidence: alternating repeated cold builds at
               local[N] and local[4N] (default 1 vs 4, see
               SPARK_GRAFT_SCALE_LEVELS) in fresh JVMs over identical
               replicated input; minima + efficiency written to
               BENCH/BASELINE.md — the sandbox stand-in for the north
               rule's N vs 4N executor clusters.
--serve-only : timed 20-query batch serve against a prebuilt index at
               $SPARK_GRAFT_INDEX_DIR (used by --query-scaling).
--query-scaling : the serving twin of --scaling: build one index over
               the replicated corpus (untimed), then serve the same
               query batch at local[N] and local[4N] in fresh JVMs;
               appends the section to BENCH/BASELINE.md (run AFTER
               --scaling, which rewrites that file).
--dedup-only : timed MinHash/LSH candidate-pair pipeline over
               $SPARK_GRAFT_CORPUS_DIR (used by --dedup-scaling).
--dedup-scaling : the curation twin: the MinHash family end-to-end
               over the replicated corpus at local[N] and local[4N]
               in fresh JVMs; appends the section to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DISJ_QUERIES = [
    "spark query data",
    "table row filter",
    "window agg key",
    "hash scan slow",
    "fast value part",
    "batch order column",
    "small line customer",
    "join data window",
    "query filter hash join",
    "the fast slow",
]
CONJ_QUERIES = [
    "data row",
    "table value",
    "spark column",
    "filter scan",
    "key hash agg",
    "window batch",
    "join order",
    "fast small",
    "query line",
    "value part row",
]


def _sf(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _warm_python_workers(spark, n: int | None = None) -> None:
    """Force-start every executor-thread's Python worker once (each pays
    a one-off fork + pandas/pyarrow/package import, ~2-4 s; with 30+
    cold workers the first Arrow-UDF stage otherwise measures an import
    storm instead of the engine)."""
    import pandas as pd

    n = n or CPUS

    def _noop(batches):
        for b in batches:
            yield pd.DataFrame({"x": b["id"]})

    (
        spark.range(n * 4)
        .repartition(n)
        .mapInPandas(_noop, "x long")
        .count()
    )


def _min_of(fn, reps: int = 2) -> float:
    """Best-of-``reps`` wall time: single-shot cold timings on this
    shared VM swing up to 4x rep-to-rep (measured r2: same query/code
    58.2s vs 15.6s), so the min is the interference-free estimate and
    makes round-over-round comparisons meaningful. EVERY suite entry
    uses this (round 3 covered only the contract loop, and exactly the
    uncovered entries regressed in BENCH_r03)."""
    best = float("inf")
    for _rep in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def run_suite() -> dict:
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.query import QueryEngine
    from search_engine_spark.runtime import get_spark
    from search_engine_spark import contract
    from search_engine_spark import query as query_mod

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extras: dict = {}
    index_dir = tempfile.mkdtemp(prefix="se_bench_idx_")
    index_dir2 = tempfile.mkdtemp(prefix="se_bench_idx2_")
    try:
        docs = load_documents(spark, SF_DIR)
        n_docs = docs.count()
        _warm_python_workers(spark)

        # min-of-2 cold builds into distinct dirs (resume=False; the
        # first dir serves the query entries below)
        best = float("inf")
        for d in (index_dir, index_dir2):
            t0 = time.time()
            IndexBuilder(
                spark, d, bucket_count=16,
                materialize_postings=False,
            ).build(docs, resume=False)
            best = min(best, time.time() - t0)
        timings["index_build"] = best
        extras["docs_per_sec"] = round(n_docs / timings["index_build"], 1)
        extras["n_docs"] = n_docs
        shutil.rmtree(index_dir2, ignore_errors=True)

        qe = QueryEngine(spark, index_dir)
        # steady-state: one untimed pass warms readers + remaining workers
        qe.batch_search(
            list(enumerate(DISJ_QUERIES[:2])), mode="disjunctive"
        ).collect()

        timings["batch_disjunctive"] = _min_of(
            lambda: qe.batch_search(
                list(enumerate(DISJ_QUERIES)), mode="disjunctive"
            ).collect()
        )
        timings["batch_conjunctive"] = _min_of(
            lambda: qe.batch_search(
                list(enumerate(CONJ_QUERIES)), mode="conjunctive"
            ).collect()
        )

        nq = len(DISJ_QUERIES) + len(CONJ_QUERIES)
        extras["queries_per_sec"] = round(
            nq / (timings["batch_disjunctive"] + timings["batch_conjunctive"]),
            2,
        )

        def local_20q():
            # 10 DISTINCT queries x 2 passes: with the serving caches a
            # single repeated query would measure pure cache hits; a
            # mixed workload exercises cold reads AND warm hits the way
            # a real query stream (Zipf repetition) does
            for q in DISJ_QUERIES * 2:
                qe.search_local(q, "disjunctive")

        timings["local_path_20q"] = _min_of(local_20q)
        # the interactive/REPL serving path (no Spark job per query)
        extras["local_queries_per_sec"] = round(
            20 / timings["local_path_20q"], 1
        )

        # The above-METADATA_CAP web-scale planners (_spark_banded /
        # _batch_banded): force the cap to 4 so the sf0.1 index takes
        # the distributed banded path — these are the plans that run at
        # 10^12 docs, and rounds 1-3 never timed them.
        cap_prev = query_mod.METADATA_CAP
        query_mod.METADATA_CAP = 4
        try:
            timings["banded_disjunctive"] = _min_of(
                lambda: qe.search("spark query data", "disjunctive").collect()
            )
            timings["banded_batch_disjunctive"] = _min_of(
                lambda: qe.batch_search(
                    list(enumerate(DISJ_QUERIES)), mode="disjunctive"
                ).collect()
            )
        finally:
            query_mod.METADATA_CAP = cap_prev

        # wildcard: capped lexicon expansion + disjunctive over the union
        timings["prefix_search"] = _min_of(
            lambda: qe.prefix_search("s* data", max_expansions=4).collect()
        )

        # boolean (a OR b OR c) AND NOT d: excluded postings decode
        # once, anti-join at the aggregation convergence point
        timings["boolean_not_search"] = _min_of(
            lambda: qe.search_not("spark query data", "slow").collect()
        )

        # faceted search: exact per-host counts over the full match set
        # (no WAND pruning possible — the Sigma-df decode is the cost)
        timings["facet_counts"] = _min_of(
            lambda: qe.facet_counts("spark query data").collect()
        )

        # host-collapsed retrieval: full-match-set scoring + per-host
        # max_by reduction (site diversification)
        timings["collapsed_search"] = _min_of(
            lambda: qe.search_collapsed("spark query data").collect()
        )

        # PRF expansion + MLT: top-k-bounded point-access pipelines
        timings["expansion_terms"] = _min_of(
            lambda: qe.expansion_terms("spark query data").collect()
        )
        timings["more_like_this"] = _min_of(
            lambda: qe.more_like_this(7).collect()
        )

        # typo tolerance: side-table derivation once, then the
        # point-lookup expansion + capped disjunctive per query
        from search_engine_spark.build import build_fuzzy_index

        t0 = time.time()
        build_fuzzy_index(spark, index_dir)
        timings["fuzzy_index_build"] = round(time.time() - t0, 3)
        timings["fuzzy_search"] = _min_of(
            lambda: qe.fuzzy_search("qery sparkk").collect()
        )

        # index fsck: the full artifact-consistency scan (deep payload
        # decode included) an operator runs before serving a copied/
        # merged/upserted index — priced here so its cost per segment
        # is on the record
        from search_engine_spark import maintenance as _maint

        timings["index_fsck"] = _min_of(
            lambda: _maint.check_index(spark, index_dir, deep=True)
            .collect()
        )

        # positional index + its consumers (phrase / NEAR-window);
        # min-of-2 cold builds like the main index
        import numpy as np

        pos_dir = tempfile.mkdtemp(prefix="se_bench_pos_")
        pos_dir2 = tempfile.mkdtemp(prefix="se_bench_pos2_")
        try:
            best = float("inf")
            for d in (pos_dir, pos_dir2):
                t0 = time.time()
                IndexBuilder(
                    spark, d, bucket_count=16, store_positions=True,
                    materialize_postings=False,
                ).build(docs, resume=False)
                best = min(best, time.time() - t0)
            timings["positional_index_build"] = best
            shutil.rmtree(pos_dir2, ignore_errors=True)
            pqe = QueryEngine(spark, pos_dir)
            timings["phrase_search"] = _min_of(
                lambda: pqe.phrase_search("fast value part").collect()
            )
            timings["proximity_search"] = _min_of(
                lambda: pqe.proximity_search(
                    "spark query data", window=8
                ).collect()
            )
            timings["ordered_window_search"] = _min_of(
                lambda: pqe.ordered_window_search(
                    "table row scan", window=10
                ).collect()
            )
        finally:
            shutil.rmtree(pos_dir, ignore_errors=True)
            shutil.rmtree(pos_dir2, ignore_errors=True)

        # maintenance lifecycle + multi-segment serving — the write
        # path on the clock: a tombstoned index's compaction rewrite,
        # a url upsert (delta tokenize + map-only merge; the cost that
        # replaces a full rebuild), and LSM scatter-gather serving
        # over base + 2 delta segments (thread-parallel per-segment
        # jobs, latency ~ max-of-segments).
        from pyspark.sql import functions as F

        from search_engine_spark import maintenance
        from search_engine_spark.query import MultiIndexQueryEngine

        work = tempfile.mkdtemp(prefix="se_bench_maint_")
        try:
            dels = docs.where(F.col("doc_id") % 10 == 3).select("doc_id")
            tomb = os.path.join(work, "tomb")
            shutil.copytree(index_dir, tomb)
            maintenance.delete_docs(spark, tomb, dels)
            best = float("inf")
            for i in range(2):
                t0 = time.time()
                maintenance.compact_index(
                    spark, tomb, os.path.join(work, f"compact{i}")
                )
                best = min(best, time.time() - t0)
            timings["compact"] = best

            upd = docs.where(F.col("doc_id") % 17 == 5).withColumn(
                "text", F.concat("text", F.lit(" v2"))
            )
            best = float("inf")
            for i in range(2):
                b = os.path.join(work, f"upbase{i}")
                shutil.copytree(index_dir, b)
                t0 = time.time()
                maintenance.upsert_docs(
                    spark,
                    b,
                    upd,
                    os.path.join(work, f"upout{i}"),
                    delta_dir=os.path.join(work, f"updelta{i}"),
                )
                best = min(best, time.time() - t0)
            timings["upsert"] = best

            # serve base + 2 upsert deltas WITHOUT merging — the LSM
            # freshness case. Segments are disjoint (one segment per
            # alive doc, the engine's precondition): wave 1 is the
            # timed upsert above (upbase0 tombstoned for doc_id%17==5,
            # its delta at updelta0); wave 2 tombstones a DISJOINT
            # slice (%17==6) by url and builds its delta, untimed.
            base_seg = os.path.join(work, "upbase0")
            from search_engine_spark.maintenance import read_stage_parquet

            upd2 = docs.where(F.col("doc_id") % 17 == 6).withColumn(
                "text", F.concat("text", F.lit(" v3"))
            )
            dt = read_stage_parquet(
                spark, os.path.join(base_seg, "doc_table"), "doc_table"
            )
            maintenance.delete_docs(
                spark,
                base_seg,
                dt.join(upd2.select("url").distinct(), "url").select(
                    "doc_id"
                ),
            )
            d2 = os.path.join(work, "lsmdelta2")
            IndexBuilder(
                spark, d2, bucket_count=16, materialize_postings=False
            ).build(upd2)
            with MultiIndexQueryEngine(
                spark, [base_seg, os.path.join(work, "updelta0"), d2]
            ) as mqe:
                mqe.search(DISJ_QUERIES[0], "disjunctive").collect()  # warm

                def lsm_3q():
                    for q in DISJ_QUERIES[1:4]:
                        mqe.search(q, "disjunctive").collect()

                timings["lsm_serve_3q"] = _min_of(lsm_3q)

            # term-bloom-pruned serving: sidecars on all 3 segments,
            # then a query for a delta-only token ("v3" exists only in
            # the second upsert wave) — the bloom rules out base and
            # delta1 driver-side, so only delta2 pays any Spark job.
            # The common-vocab 3q batch re-times flat (every segment
            # stays eligible; measures bloom probe overhead ~= 0).
            from search_engine_spark.build import build_term_bloom

            segs = [base_seg, os.path.join(work, "updelta0"), d2]
            for s in segs:
                build_term_bloom(spark, s)
            with MultiIndexQueryEngine(spark, segs) as mqe:
                mqe.search(DISJ_QUERIES[0], "disjunctive").collect()  # warm

                def lsm_pruned():
                    mqe.search("v3", "disjunctive").collect()
                    assert mqe.last_searched_segments == 1

                timings["lsm_bloom_pruned_q"] = _min_of(lsm_pruned)

                def lsm_3q_bloom():
                    for q in DISJ_QUERIES[1:4]:
                        mqe.search(q, "disjunctive").collect()

                timings["lsm_serve_3q_bloom"] = _min_of(lsm_3q_bloom)
        finally:
            # close() above released the per-segment pinned metadata
            # caches so the remaining timed entries run with clean
            # executor storage
            shutil.rmtree(work, ignore_errors=True)

        for name in [
            "bm25_disjunctive",
            "bm25_conjunctive",
            "minhash_signatures",
            "lsh_candidate_pairs",
            "lsh_incremental",
            "simhash",
            "ann_cosine_topk",
            "dedup_exact",
            "decontaminate",
            "span_dedup",
            "line_dedup",
            "dedup_clusters",
            "quality_score",
            "quality_classifier",
            "lm_score",
            "semantic_dedup",
            "events_hourly",
            "multimodal_features",
            "pii_redact",
            "pack_sequences",
            "url_dedup",
        ]:
            fn = contract.queries()[name]
            timings[name] = _min_of(lambda: fn(spark, SF_DIR).collect())
        extras["timing_method"] = "min_of_2_all"
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        shutil.rmtree(index_dir2, ignore_errors=True)
        spark.stop()

    timings = {k: round(v, 3) for k, v in timings.items()}
    return {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf(SF_DIR),
        "cpus": CPUS,
        **extras,
    }


def synthesize_corpus(out_dir: str, replicate: int = 20) -> None:
    """Deterministically replicate the SF_DIR documents table
    ``replicate``× (distinct doc_ids, slightly varied text) so the
    scaling run measures sustained engine throughput rather than
    fixed job-scheduling overhead. Same schema as the driver table."""
    from pyspark.sql import functions as F

    from search_engine_spark.runtime import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        big = (
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
                ).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + 6).alias("n_chars"),
            )
            .repartition(CPUS)
        )
        big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    finally:
        spark.stop()


def run_build_only() -> dict:
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.runtime import get_spark

    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR", SF_DIR)
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    index_dir = tempfile.mkdtemp(
        prefix="se_scale_idx_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        docs = load_documents(spark, corpus_dir)
        n_docs = docs.count()
        _warm_python_workers(spark)
        t0 = time.time()
        manifest = IndexBuilder(
            spark, index_dir, bucket_count=16,
            materialize_postings=False,
        ).build(docs, resume=False)
        secs = time.time() - t0
        stage_secs = {
            s: m["seconds"] for s, m in manifest["stages"].items()
        }
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()
    return {
        "metric": "index_build_seconds",
        "value": round(secs, 3),
        "unit": "sec",
        "queries": {"index_build": round(secs, 3), **stage_secs},
        "sf": _sf(SF_DIR),
        "cpus": CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 1),
    }


def _ensure_scale_corpus(replicate: int) -> str:
    """Synthesize (or reuse, keyed by replicate factor) the
    deterministic replicated corpus the scaling runs build over."""
    corpus_dir = os.path.join(
        tempfile.gettempdir(), f"se_scale_corpus_x{replicate}"
    )
    marker = os.path.join(corpus_dir, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        print(
            f"synthesizing {replicate}x corpus at {corpus_dir}",
            file=sys.stderr,
        )
        synthesize_corpus(corpus_dir, replicate)
    return corpus_dir


def run_serve_only() -> dict:
    """Timed BM25 serving against a PREBUILT index (used by the
    --query-scaling subprocesses): fresh ``local[CPUS]`` JVM pointed at
    $SPARK_GRAFT_INDEX_DIR, one untimed warm batch (JIT + Python
    workers + OS page cache for the posting files), then min-of-2
    timed passes over the 20 bench queries through the batch engine
    (10 disjunctive + 10 conjunctive, block-max WAND both modes)."""
    from search_engine_spark.query import QueryEngine
    from search_engine_spark.runtime import get_spark

    index_dir = os.environ["SPARK_GRAFT_INDEX_DIR"]
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        _warm_python_workers(spark)
        qe = QueryEngine(spark, index_dir)
        qe.batch_search(
            list(enumerate(DISJ_QUERIES)), mode="disjunctive"
        ).collect()

        def work():
            qe.batch_search(
                list(enumerate(DISJ_QUERIES)), mode="disjunctive"
            ).collect()
            qe.batch_search(
                list(enumerate(CONJ_QUERIES)), mode="conjunctive"
            ).collect()

        secs = _min_of(work, reps=2)
    finally:
        spark.stop()
    nq = len(DISJ_QUERIES) + len(CONJ_QUERIES)
    return {
        "metric": "serve_seconds",
        "value": round(secs, 3),
        "unit": "sec",
        "queries": {"batch_20q": round(secs, 3)},
        "cpus": CPUS,
        "queries_per_sec": round(nq / secs, 2),
    }


def _run_levels(
    flag: str, label: str, extra_env: dict, allow_pin: bool = False
) -> tuple[list[int], int, dict[int, dict]]:
    """Shared two-parallelism harness behind every --*scaling mode:
    run ``bench.py <flag>`` in a fresh subprocess JVM at each level in
    SPARK_GRAFT_SCALE_LEVELS (default 1,4), alternating
    SPARK_GRAFT_SCALE_REPS times (default 2), two attempts per run,
    keeping each level's MINIMUM JSON record (the interference-free
    estimate on a shared host). Exits the process when any level never
    succeeds. Returns (levels, reps, best-record-per-level)."""
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4").split(",")
    ]
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    best: dict[int, dict] = {}
    for rep in range(reps):
        for n in levels:
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(n),
                SPARK_GRAFT_SF_DIR=SF_DIR,
                **extra_env,
            )
            # batch jobs prefer the throughput collector (see
            # runtime.get_spark GC note); still overridable by caller
            env.setdefault("SPARK_GRAFT_GC", "parallel")
            cmd = [sys.executable, __file__, flag]
            if (
                allow_pin
                and os.environ.get("SPARK_GRAFT_PIN", "0") == "1"
                and shutil.which("taskset")
            ):
                cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
            r = None
            for attempt in range(2):
                out = subprocess.run(
                    cmd, capture_output=True, text=True, env=env
                )
                lines = [
                    l
                    for l in out.stdout.strip().splitlines()
                    if l.startswith("{")
                ]
                if out.returncode == 0 and lines:
                    r = json.loads(lines[-1])
                    break
                print(
                    f"rep{rep} {label} local[{n}] attempt{attempt} failed "
                    f"(rc={out.returncode}): {out.stderr[-500:]}",
                    file=sys.stderr,
                )
            if r is None:
                continue
            print(
                f"rep{rep} {label} local[{n}]: {r['value']}s",
                file=sys.stderr,
            )
            if n not in best or r["value"] < best[n]["value"]:
                best[n] = r
    missing = [n for n in levels if n not in best]
    if missing:
        sys.exit(
            f"{label}-scaling run failed: no successful run at "
            f"parallelism level(s) {missing} (see stderr above for "
            "per-attempt errors)"
        )
    return levels, reps, best


def run_query_scaling(replicate: int = 800) -> None:
    """N vs 4N scaling evidence for the QUERY/serving side — the
    BM25 half of the north metric (the build half is --scaling).

    One index is built (or resumed) over the replicated corpus,
    untimed, at full width; then fresh ``local[N]`` JVMs serve the
    same 20-query batch workload against that index at each
    parallelism level, alternating ``reps`` times, minima reported
    (same interference rationale as --scaling). Appends a section to
    BENCH/BASELINE.md — run it AFTER --scaling, which rewrites that
    file from its own header + HISTORY.md."""
    replicate = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", replicate))
    corpus_dir = _ensure_scale_corpus(replicate)
    index_dir = os.path.join(
        tempfile.gettempdir(), f"se_qscale_idx_x{replicate}"
    )

    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.runtime import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        docs = load_documents(spark, corpus_dir)
        n_docs = docs.count()
        # resume=True: a completed manifest from a prior run skips the
        # whole build — the serve measurement is index-identical across
        # reruns by construction
        IndexBuilder(
            spark, index_dir, bucket_count=16, materialize_postings=False
        ).build(docs, resume=True)
    finally:
        spark.stop()

    levels, reps, best = _run_levels(
        "--serve-only", "serve", {"SPARK_GRAFT_INDEX_DIR": index_dir}
    )
    lo, hi = levels[0], levels[-1]
    t_lo, t_hi = best[lo]["value"], best[hi]["value"]
    q_lo, q_hi = best[lo]["queries_per_sec"], best[hi]["queries_per_sec"]
    ratio = hi // lo
    eff = (t_lo / t_hi) / ratio
    md = f"""

## Query-side scaling (N vs 4N, serving)

The BM25 half of the north metric, measured like the build half:
fresh `local[N]` JVMs serving the SAME 20-query bench batch (10
disjunctive + 10 conjunctive, block-max WAND both modes, batch
engine) against ONE prebuilt index over the {replicate}x replicated
corpus ({n_docs} docs). Each level ran {reps} times alternating after
an untimed warm pass; minima reported.

| parallelism | serve seconds (20q) | queries/sec |
| --- | --- | --- |
| local[{lo}]  (N)  | {t_lo} | {q_lo} |
| local[{hi}] ({ratio}N) | {t_hi} | {q_hi} |

**Query scaling efficiency (N to {ratio}N) = (T_N / T_{ratio}N) / {ratio} = {eff:.3f}**
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "metric": f"query_scaling_efficiency_{lo}_to_{hi}",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {
                    f"serve_local{lo}_sec": t_lo,
                    f"serve_local{hi}_sec": t_hi,
                    f"qps_local{lo}": q_lo,
                    f"qps_local{hi}": q_hi,
                },
                "sf": _sf(SF_DIR),
                "n_docs": n_docs,
            }
        )
    )


def run_dedup_only() -> dict:
    """Timed curation hot path (used by the --dedup-scaling
    subprocesses): fresh ``local[CPUS]`` JVM over
    $SPARK_GRAFT_CORPUS_DIR/documents.parquet, one untimed warm pass,
    then min-of-2 timed runs of the full MinHash family — shingle
    stream -> one md5 + 16 universal permutations -> wide per-doc agg
    -> band keys -> capped bucket pair expansion (``lsh_candidate_pairs
    (max_bucket_size=50)``). The replicated scale corpus varies each
    replica by one trailing token, so replicas LSH-collide into
    replicate-sized buckets; a cap of 50 (below the replication factor)
    drops those boilerplate buckets exactly like a web dedup run would,
    so the probe times the hash/agg/shuffle engine, not an O(B^2) pair
    explosion."""
    from search_engine_spark import dedup
    from search_engine_spark.runtime import get_spark

    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR", SF_DIR)
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        n_docs = docs.count()

        def work():
            dedup.lsh_candidate_pairs(docs, max_bucket_size=50).count()

        work()  # warm: JIT, codegen, OS page cache for the parquet
        secs = _min_of(work, reps=2)
    finally:
        spark.stop()
    return {
        "metric": "dedup_seconds",
        "value": round(secs, 3),
        "unit": "sec",
        "queries": {"lsh_candidate_pairs": round(secs, 3)},
        "cpus": CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 1),
    }


def run_dedup_scaling(replicate: int = 100) -> None:
    """N vs 4N scaling evidence for the CURATION side — the MinHash/
    LSH dedup family that round 5 reworked (one md5 + universal
    permutations, shuffle-free band keys). Same harness discipline as
    --scaling / --query-scaling: fresh ``local[N]`` JVMs over the
    IDENTICAL replicated corpus, levels alternated ``reps`` times,
    minima reported, section appended to BENCH/BASELINE.md (run AFTER
    --scaling, which rewrites that file)."""
    replicate = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", replicate))
    corpus_dir = _ensure_scale_corpus(replicate)
    levels, reps, best = _run_levels(
        "--dedup-only", "dedup", {"SPARK_GRAFT_CORPUS_DIR": corpus_dir}
    )
    lo, hi = levels[0], levels[-1]
    t_lo, t_hi = best[lo]["value"], best[hi]["value"]
    d_lo, d_hi = best[lo]["docs_per_sec"], best[hi]["docs_per_sec"]
    n_docs = best[hi]["n_docs"]
    ratio = hi // lo
    eff = (t_lo / t_hi) / ratio
    md = f"""

## Curation-side scaling (N vs 4N, MinHash/LSH dedup)

The third two-parallelism probe: the round-5 MinHash family
(one md5 per shingle + 16 universal-hash permutations, wide per-doc
agg, shuffle-free band keys, capped bucket pair expansion at
max_bucket_size=50) run end-to-end over the {replicate}x replicated
corpus ({n_docs} docs) in fresh `local[N]` JVMs, levels alternated
{reps} times after an untimed warm pass, minima reported.

| parallelism | dedup seconds | docs/sec |
| --- | --- | --- |
| local[{lo}]  (N)  | {t_lo} | {d_lo} |
| local[{hi}] ({ratio}N) | {t_hi} | {d_hi} |

**Curation scaling efficiency (N to {ratio}N) = (T_N / T_{ratio}N) / {ratio} = {eff:.3f}**
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "metric": f"dedup_scaling_efficiency_{lo}_to_{hi}",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {
                    f"dedup_local{lo}_sec": t_lo,
                    f"dedup_local{hi}_sec": t_hi,
                    f"docs_per_sec_local{lo}": d_lo,
                    f"docs_per_sec_local{hi}": d_hi,
                },
                "sf": _sf(SF_DIR),
                "n_docs": n_docs,
            }
        )
    )


def run_scaling(replicate: int = 800) -> None:
    """N vs 4N scaling evidence.

    Levels default to local[1] vs local[4]: this VM's kernel serializes
    the JVM<->Python Arrow channel above ~8 concurrent workers (pure-JVM
    jobs scale 4.5x from 8->32 threads, Python-UDF stages do not), so
    low core counts are the regime where the sandbox can express the engine's
    actual scaling. Noisy-neighbor interference is intermittent, so each
    level runs ``reps`` times alternating and the MINIMUM is reported
    (the min is the interference-free estimate).

    SPARK_GRAFT_PIN=1 additionally pins each level's JVM to exactly N
    cores with ``taskset`` (hard core budget: GC/JIT/Python workers
    included). Measured at 1M docs on this host, pinning slows
    local[4] 64%% while local[1] barely moves (the unpinned 4-thread
    run overlaps Python workers + GC onto spare cores; the 1-thread
    run's pipeline is serial and can't) — i.e. unpinned local[N] is
    the FAVORABLE reading for the 4N level, and pinned is a stricter
    lower bound. Default is unpinned, matching the criterion's
    "two parallelism levels" wording and rounds 1-2.
    """
    replicate = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", replicate))
    corpus_dir = _ensure_scale_corpus(replicate)
    levels, reps, best = _run_levels(
        "--build-only",
        "build",
        {"SPARK_GRAFT_CORPUS_DIR": corpus_dir},
        allow_pin=True,
    )
    lo, hi = levels[0], levels[-1]
    t_lo, t_hi = best[lo]["value"], best[hi]["value"]
    d_lo, d_hi = best[lo]["docs_per_sec"], best[hi]["docs_per_sec"]
    ratio = hi // lo
    eff = (t_lo / t_hi) / ratio
    n_docs = best[lo]["n_docs"]
    stage_rows = "\n".join(
        f"| {s} | {best[lo]['queries'].get(s, '-')} | "
        f"{best[hi]['queries'].get(s, '-')} |"
        for s in ("tokens", "doc_table", "stats", "postings", "chunks", "lexicon")
    )
    md = f"""# BENCH baseline — measured numbers (our engine)

Scaling evidence for the north rule's N vs 4N criterion, run in-sandbox
as fresh `local[N]` JVMs (one Spark JVM, N executor threads) over
identical input: the driver {SF_DIR} documents table deterministically
replicated {replicate}x = {n_docs} docs, full cold index build (all 6
checkpointed stages including parquet writes). Each level ran {reps}
times alternating; minima reported (noisy-neighbor interference on this
shared VM is intermittent — the min is the interference-free estimate).

| parallelism | build seconds | docs/sec |
| --- | --- | --- |
| local[{lo}]  (N)  | {t_lo} | {d_lo} |
| local[{hi}] ({ratio}N) | {t_hi} | {d_hi} |

**Scaling efficiency (N to {ratio}N) = (T_N / T_{ratio}N) / {ratio} = {eff:.3f}**

Per-stage seconds (min runs):

| stage | local[{lo}] | local[{hi}] |
| --- | --- | --- |
{stage_rows}

Method notes:
- Why N={lo} vs 4N={hi}: this sandbox VM's kernel serializes the
  JVM<->Python Arrow socket channel above ~8 concurrent Python workers
  (measured: a pure-JVM aggregation scales 3.6s -> 0.8s = 4.5x from
  local[8] to local[32], while Arrow-UDF stages plateau or regress;
  mostly-idle CPU with high sys%% during the regressions). {lo}->{hi}
  cores is the regime where the sandbox can express the engine's real
  scaling; on genuine multi-executor clusters each executor runs few
  Python workers against its own kernel, which is exactly this regime.
- Python workers are pre-warmed in both runs (untimed), so the timed
  region measures tokenize/encode/shuffle throughput, not interpreter
  startup (which amortizes on long-running clusters).
- `local[N]` shares one JVM/driver, so fixed per-stage overheads (job
  scheduling, parquet commit protocol) are NOT parallelized — this
  systematically UNDERSTATES multi-executor scaling.
- Shuffle/spill dirs are tmpfs (`spark.local.dir=/dev/shm/...`): the
  VM's virtio disk has high per-syscall latency (a 48s build dropped to
  18.5s from this change alone); real clusters provision local SSDs
  for exactly this role.
- Per-suite timings at sf0.1 are recorded by the driver in
  BENCH_r*.json (same harness, default mode).
- Hard core pinning (`taskset`, SPARK_GRAFT_PIN=1) was probed and is
  disclosed, not used for the headline: at 1M docs it slows the 4N
  level ~64%% (Python workers/GC lose their overlap onto spare cores)
  while the serial N=1 pipeline barely moves. Unpinned local[N] —
  the criterion's "two parallelism levels" and the rounds-1/2 method —
  lets both levels overlap background work the way distinct cluster
  nodes (each with its own GC/OS headroom) actually do.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    hist = os.path.join(REPO, "BENCH", "HISTORY.md")
    if os.path.exists(hist):
        with open(hist) as f:
            md += "\n" + f.read()
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "metric": f"scaling_efficiency_{lo}_to_{hi}",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {
                    f"build_local{lo}_sec": t_lo,
                    f"build_local{hi}_sec": t_hi,
                    f"docs_per_sec_local{lo}": d_lo,
                    f"docs_per_sec_local{hi}": d_hi,
                },
                "sf": _sf(SF_DIR),
                "n_docs": n_docs,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--query-scaling" in sys.argv:
        run_query_scaling()
    elif "--build-only" in sys.argv:
        print(json.dumps(run_build_only()))
    elif "--serve-only" in sys.argv:
        print(json.dumps(run_serve_only()))
    elif "--dedup-scaling" in sys.argv:
        run_dedup_scaling()
    elif "--dedup-only" in sys.argv:
        print(json.dumps(run_dedup_only()))
    else:
        print(json.dumps(run_suite()))
