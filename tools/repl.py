#!/usr/bin/env python
"""Interactive query REPL — parity with the reference's query_process
loop (/root/reference/query_process.cpp:36-55: query, then mode
0=conjunctive/1=disjunctive, then snippet flag).

Usage: python tools/repl.py <index_dir> [--spark]

Default serves from the driver-local path (pyarrow scan + numpy BM25,
~ms latency, no Spark jobs); --spark routes through the DataFrame
engine instead.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    index_dir = sys.argv[1]
    use_spark = "--spark" in sys.argv

    from search_engine_spark.query import QueryEngine
    from search_engine_spark.runtime import get_spark

    spark = get_spark(master="local[4]" if not use_spark else None)
    qe = QueryEngine(spark, index_dir)
    print(
        f"index: {index_dir} | n_docs={qe.n_docs} avgdl={qe.avgdl:.2f} | "
        f"path={'spark' if use_spark else 'local'}"
    )
    while True:
        try:
            query = input("query> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not query or query in {"exit", "quit"}:
            break
        mode_in = input("mode (0=AND conjunctive, 1=OR disjunctive) [1]> ").strip()
        mode = "conjunctive" if mode_in == "0" else "disjunctive"
        snips = input("snippets? (y/N)> ").strip().lower() == "y"

        import time

        t0 = time.time()
        if use_spark or snips:
            topk = qe.search(query, mode=mode, k=10)
            rows = [(r["doc_id"], r["score"]) for r in topk.collect()]
        else:
            rows = qe.search_local(query, mode=mode, k=10)
        ms = (time.time() - t0) * 1000
        if not rows:
            print("  (no results)")
            continue
        for rank, (doc_id, score) in enumerate(rows, 1):
            print(f"  {rank:2d}. doc_id={doc_id:<12d} score={score:.4f}")
        print(f"  [{ms:.1f} ms, mode={mode}]")
        if snips:
            for r in qe.snippets(query, topk).collect():
                first = r["snippets"][0] if r["snippets"] else ""
                print(f"  -- doc {r['doc_id']}: {first[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
