"""CLI entry points — the ``spark-submit --py-files`` shipping path.

Package the library once:

    python -m search_engine_spark zip --out /tmp/search_engine_spark.zip

then drive a cluster build / query with vanilla spark-submit (the
script is this module; the zip makes the package importable inside
executor Python workers):

    spark-submit --py-files /tmp/search_engine_spark.zip \
        /path/to/search_engine_spark/__main__.py \
        build --docs s3://bucket/corpus --index-dir s3://bucket/index

    spark-submit --py-files /tmp/search_engine_spark.zip \
        /path/to/search_engine_spark/__main__.py \
        query --index-dir s3://bucket/index --query "spark query" \
        --mode conjunctive -k 10

Interactive/driver-embedded use doesn't need any of this —
``runtime.get_spark()`` ships the package programmatically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit runs this file as a BARE SCRIPT (no package context), so
# imports of our own package must be absolute; the --py-files zip puts
# `search_engine_spark` on sys.path. When the script is launched from a
# source checkout WITHOUT --py-files (local smoke runs), fall back to
# the checkout root.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:  # pragma: no cover - trivial import guard
    import search_engine_spark  # noqa: F401
except ImportError:  # running as a script from a checkout
    sys.path.insert(0, _REPO_ROOT)


def _spark():
    # under spark-submit the session carries the submitted conf; local
    # runs get the tuned defaults
    from search_engine_spark.runtime import get_spark

    return get_spark(app_name="search_engine_spark-cli")


def cmd_zip(args) -> int:
    import os
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(
                        full,
                        os.path.join(pkg_name, os.path.relpath(full, pkg_dir)),
                    )
    print(args.out)
    return 0


def cmd_build(args) -> int:
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents

    spark = _spark()
    if args.docs.endswith(".parquet"):
        docs = spark.read.parquet(args.docs)
    else:
        docs = load_documents(spark, args.docs)
    manifest = IndexBuilder(
        spark,
        args.index_dir,
        n_salts=args.n_salts,
        bucket_count=args.bucket_count,
        table_format=args.table_format,
        catalog=args.catalog,
        materialize_postings=args.materialize_postings,
        store_positions=args.store_positions,
    ).build(docs, resume=not args.no_resume)
    print(json.dumps({s: m["rows"] for s, m in manifest["stages"].items()}))
    return 0


def _engine(spark, index_dir: str):
    """Open a QueryEngine, or — for a comma-separated [base,delta,...]
    list — a MultiIndexQueryEngine serving the LSM stack."""
    from search_engine_spark.query import (
        MultiIndexQueryEngine,
        QueryEngine,
    )

    if "," in index_dir:
        return MultiIndexQueryEngine(
            spark, [d for d in index_dir.split(",") if d]
        )
    return QueryEngine(spark, index_dir)


def cmd_query(args) -> int:
    qe = _engine(_spark(), args.index_dir)
    if args.mode == "phrase":
        res = qe.phrase_search(args.query, k=args.k)
    elif args.mode == "near":
        res = qe.proximity_search(args.query, window=args.window, k=args.k)
    elif args.mode == "prefix":
        res = qe.prefix_search(args.query, k=args.k)
    elif args.mode == "fuzzy":
        res = qe.fuzzy_search(args.query, k=args.k)
    elif args.mode == "not":
        res = qe.search_not(args.query, args.exclude or "", k=args.k)
    elif args.mode == "collapsed":
        for r in qe.search_collapsed(args.query, k=args.k).collect():
            print(f"{r['doc_id']}\t{r['host']}\t{r['score']:.6f}")
        return 0
    else:
        res = qe.search(args.query, mode=args.mode, k=args.k)
    rows = res.collect()
    for r in rows:
        print(f"{r['doc_id']}\t{r['score']:.6f}")
    return 0


def cmd_suggest(args) -> int:
    qe = _engine(_spark(), args.index_dir)
    for r in qe.suggest(args.prefix, n=args.n).collect():
        print(f"{r['term']}\t{r['df']}")
    return 0


def cmd_correct(args) -> int:
    qe = _engine(_spark(), args.index_dir)
    for r in sorted(
        qe.did_you_mean(args.query).collect(), key=lambda r: r["pos"]
    ):
        print(f"{r['term']}\t{r['correction']}\t{r['df']}")
    return 0


def cmd_facets(args) -> int:
    qe = _engine(_spark(), args.index_dir)
    res = qe.facet_counts(args.query, mode=args.mode, top_n=args.top_n)
    for r in res.collect():
        print(f"{r['facet']}\t{r['n_docs']}")
    return 0


def cmd_stats(args) -> int:
    qe = _engine(_spark(), args.index_dir)
    if "," in args.index_dir:
        # one line per segment for an LSM stack
        for r in qe.segment_stats().collect():
            d = r.asDict()
            print(" ".join(f"{k}={d[k]}" for k in d))
        return 0
    row = qe.index_stats().collect()[0]
    for name in row.asDict():
        print(f"{name}={row[name]}")
    return 0


def cmd_fsck(args) -> int:
    """Verify index artifact consistency (maintenance.check_index).
    Prints one line per invariant; exits 1 if any check reports
    violations — the pre-serve health gate for a freshly copied,
    merged or upserted index. Accepts an LSM stack (comma-separated
    dirs), checking each segment."""
    # absolute import: under spark-submit this file runs as a bare
    # script with no package context (see module docstring)
    from search_engine_spark import maintenance

    spark = _spark()
    rc = 0
    for seg in args.index_dir.split(","):
        for r in maintenance.check_index(
            spark, seg, deep=not args.shallow
        ).collect():
            bad = int(r["n_violations"]) != 0
            rc |= int(bad)
            print(
                f"{seg} {r['check_name']}: examined={r['n_examined']} "
                f"violations={r['n_violations']}"
                + (" FAIL" if bad else "")
            )
    return rc


def cmd_build_fuzzy(args) -> int:
    from search_engine_spark.build import build_fuzzy_index

    build_fuzzy_index(_spark(), args.index_dir)
    return 0


def cmd_build_bloom(args) -> int:
    from search_engine_spark.build import build_term_bloom

    print(json.dumps(build_term_bloom(_spark(), args.index_dir)))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="search_engine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    z = sub.add_parser("zip", help="build the --py-files artifact")
    z.add_argument("--out", default="search_engine_spark.zip")
    z.set_defaults(fn=cmd_zip)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--docs", required=True, help="corpus parquet path or sf dir")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--n-salts", type=int, default=None, help="default: auto")
    b.add_argument("--bucket-count", type=int, default=16)
    b.add_argument("--table-format", default="parquet")
    b.add_argument("--catalog", default=None)
    b.add_argument("--materialize-postings", action="store_true")
    b.add_argument("--store-positions", action="store_true",
                   help="also persist (term, doc_id, tf, positions) for "
                        "phrase/near queries")
    b.add_argument("--no-resume", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k query")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--mode", default="disjunctive",
                   choices=["disjunctive", "conjunctive", "phrase", "near",
                            "prefix", "fuzzy", "not", "collapsed"])
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--window", type=int, default=8,
                   help="NEAR window size (mode=near)")
    q.add_argument("--exclude", default="",
                   help="excluded terms (mode=not)")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("suggest", help="df-ranked prefix autocomplete")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--prefix", required=True)
    s.add_argument("-n", type=int, default=10)
    s.set_defaults(fn=cmd_suggest)

    c = sub.add_parser("correct", help="per-term spell correction")
    c.add_argument("--index-dir", required=True)
    c.add_argument("--query", required=True)
    c.set_defaults(fn=cmd_correct)

    f = sub.add_parser("facets", help="per-host facet counts")
    f.add_argument("--index-dir", required=True)
    f.add_argument("--query", required=True)
    f.add_argument("--mode", default="disjunctive",
                   choices=["disjunctive", "conjunctive"])
    f.add_argument("--top-n", type=int, default=20)
    f.set_defaults(fn=cmd_facets)

    st = sub.add_parser("stats", help="one-row index summary")
    st.add_argument("--index-dir", required=True)
    st.set_defaults(fn=cmd_stats)

    fs = sub.add_parser(
        "fsck", help="verify index artifact consistency (CheckIndex)"
    )
    fs.add_argument("--index-dir", required=True)
    fs.add_argument(
        "--shallow",
        action="store_true",
        help="skip the payload-decode pass (metadata checks only)",
    )
    fs.set_defaults(fn=cmd_fsck)

    bf = sub.add_parser(
        "build-fuzzy", help="derive the SymSpell typo side table"
    )
    bf.add_argument("--index-dir", required=True)
    bf.set_defaults(fn=cmd_build_fuzzy)

    bb = sub.add_parser(
        "build-bloom",
        help="derive the term Bloom sidecar (LSM segment pruning)",
    )
    bb.add_argument("--index-dir", required=True)
    bb.set_defaults(fn=cmd_build_bloom)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
