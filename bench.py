#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., ...extras}.

--build-only : only the index build (used by --scaling subprocesses).
--scaling    : runs the build at local[8] and local[32] in fresh JVMs on
               identical input and writes BENCH/BASELINE.md with
               throughput at both and the scaling efficiency — the
               sandbox stand-in for the north rule's N vs 4N executor
               clusters.
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


def run_suite() -> dict:
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.query import QueryEngine
    from search_engine_spark.runtime import get_spark
    from search_engine_spark import contract

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extras: dict = {}
    index_dir = tempfile.mkdtemp(prefix="se_bench_idx_")
    try:
        docs = load_documents(spark, SF_DIR)
        n_docs = docs.count()
        _warm_python_workers(spark)

        t0 = time.time()
        IndexBuilder(spark, index_dir, n_salts=8, bucket_count=16).build(
            docs, resume=False
        )
        timings["index_build"] = time.time() - t0
        extras["docs_per_sec"] = round(n_docs / timings["index_build"], 1)
        extras["n_docs"] = n_docs

        qe = QueryEngine(spark, index_dir)
        # steady-state: one untimed pass warms readers + remaining workers
        qe.batch_search(
            list(enumerate(DISJ_QUERIES[:2])), mode="disjunctive"
        ).collect()

        t0 = time.time()
        qe.batch_search(
            list(enumerate(DISJ_QUERIES)), mode="disjunctive"
        ).collect()
        timings["batch_disjunctive"] = time.time() - t0

        t0 = time.time()
        qe.batch_search(
            list(enumerate(CONJ_QUERIES)), mode="conjunctive"
        ).collect()
        timings["batch_conjunctive"] = time.time() - t0

        nq = len(DISJ_QUERIES) + len(CONJ_QUERIES)
        extras["queries_per_sec"] = round(
            nq / (timings["batch_disjunctive"] + timings["batch_conjunctive"]),
            2,
        )

        t0 = time.time()
        for _ in range(20):
            qe.search_local("spark query data", "disjunctive")
        timings["local_path_20q"] = time.time() - t0

        for name in [
            "bm25_disjunctive",
            "bm25_conjunctive",
            "minhash_signatures",
            "lsh_candidate_pairs",
            "simhash",
            "ann_cosine_topk",
            "dedup_exact",
            "quality_score",
            "events_hourly",
        ]:
            fn = contract.queries()[name]
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            timings[name] = time.time() - t0
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
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


def run_build_only() -> dict:
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.runtime import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    index_dir = tempfile.mkdtemp(prefix="se_scale_idx_")
    try:
        docs = load_documents(spark, SF_DIR)
        n_docs = docs.count()
        _warm_python_workers(spark)
        t0 = time.time()
        IndexBuilder(spark, index_dir, n_salts=8, bucket_count=16).build(
            docs, resume=False
        )
        secs = time.time() - t0
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()
    return {
        "metric": "index_build_seconds",
        "value": round(secs, 3),
        "unit": "sec",
        "queries": {"index_build": round(secs, 3)},
        "sf": _sf(SF_DIR),
        "cpus": CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / secs, 1),
    }


def run_scaling() -> None:
    results = {}
    for n in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, __file__, "--build-only"],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
        print(f"local[{n}]: {results[n]}", file=sys.stderr)

    t8, t32 = results[8]["value"], results[32]["value"]
    d8, d32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    # efficiency of 4x parallelism: speedup / 4
    eff = (t8 / t32) / 4.0
    md = f"""# BENCH baseline — measured numbers (our engine)

Scaling evidence for the north rule's N vs 4N criterion, run in-sandbox
as two fresh `local[N]` JVMs over identical input ({SF_DIR},
{results[8]["n_docs"]} docs), full index build (all 6 stages, cold):

| parallelism | build seconds | docs/sec |
| --- | --- | --- |
| local[8]  (N)  | {t8} | {d8} |
| local[32] (4N) | {t32} | {d32} |

**Scaling efficiency (N→4N) = (T_N / T_4N) / 4 = {eff:.3f}**

Note: `local[N]` shares one JVM/driver, so fixed per-stage overheads
(job scheduling, parquet commit protocol, Python worker startup) are NOT
parallelized — this understates true multi-executor scaling. The
shuffle-heavy stages (postings groupBy, salted chunk encode) are the
parts that scale; see BENCH_r*.json for the full suite timings.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "queries": {
                    "build_local8_sec": t8,
                    "build_local32_sec": t32,
                },
                "sf": _sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--build-only" in sys.argv:
        print(json.dumps(run_build_only()))
    else:
        print(json.dumps(run_suite()))
