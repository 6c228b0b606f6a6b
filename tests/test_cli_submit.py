"""The north rule's shipping path, executed for real: package the
library with `python -m search_engine_spark zip`, then drive a cluster
build + query through vanilla `spark-submit --py-files` in FRESH JVMs
(no pytest session reuse, cwd outside the checkout) and check
rank-identity against the in-process engine over the same index.

This is the path that regressed silently before round 5: __main__.py
ran as a bare script under spark-submit, where relative imports have
no parent package.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
SF_DIR = os.environ.get("SE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_build_and_query(spark, tmp_path):
    zip_path = str(tmp_path / "se.zip")
    r = subprocess.run(
        [sys.executable, "-m", "search_engine_spark", "zip", "--out", zip_path],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(zip_path)

    idx = str(tmp_path / "idx")
    script = os.path.join(REPO, "search_engine_spark", "__main__.py")
    env = dict(os.environ)
    # the zip alone must make the package importable in the submitted
    # driver and its executors — no checkout on the path
    env.pop("PYTHONPATH", None)
    base = [
        SPARK_SUBMIT,
        "--master",
        "local[2]",
        "--conf",
        "spark.ui.enabled=false",
        "--py-files",
        zip_path,
        script,
    ]
    r = subprocess.run(
        base
        + ["build", "--docs", SF_DIR, "--index-dir", idx, "--no-resume"],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert '"lexicon"' in r.stdout, r.stdout[-500:]

    r = subprocess.run(
        base
        + [
            "query",
            "--index-dir",
            idx,
            "--query",
            "table scan",
            "--mode",
            "conjunctive",
            "-k",
            "5",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    got = []
    for line in r.stdout.strip().splitlines():
        if "\t" in line:
            d, s = line.split("\t")
            got.append((int(d), round(float(s), 5)))
    assert len(got) == 5

    # rank-identity: the submitted JVM's answers == the in-process
    # engine's over the index the subprocess built
    from search_engine_spark.query import QueryEngine

    qe = QueryEngine(spark, idx)
    want = [
        (int(r["doc_id"]), round(float(r["score"]), 5))
        for r in qe.search("table scan", mode="conjunctive", k=5).collect()
    ]
    assert got == want

    # the round-5 subcommands ship through the same zip: `stats` (one
    # KEY=VALUE line per column) must agree with the in-process
    # engine's summary, and `suggest` must return the df-ranked prefix
    # expansion — both in a fresh spark-submit JVM with no checkout on
    # the path.
    r = subprocess.run(
        base + ["stats", "--index-dir", idx],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    got_stats = dict(
        line.split("=", 1)
        for line in r.stdout.strip().splitlines()
        if "=" in line
    )
    want_stats = qe.index_stats().collect()[0].asDict()
    assert int(got_stats["n_docs"]) == int(want_stats["n_docs"])
    assert int(got_stats["n_terms"]) == int(want_stats["n_terms"])

    r = subprocess.run(
        base + ["suggest", "--index-dir", idx, "--prefix", "ta", "-n", "5"],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    got_sugg = [
        tuple(line.split("\t"))
        for line in r.stdout.strip().splitlines()
        if "\t" in line
    ]
    want_sugg = [
        (r2["term"], str(r2["df"]))
        for r2 in qe.suggest("ta", n=5).collect()
    ]
    assert got_sugg == want_sugg
    assert len(got_sugg) > 0


def test_fsck_cli(spark, tmp_path):
    """`fsck` subcommand: healthy index exits 0 with all-zero
    violations; a corrupted copy exits 1 and marks the failing check.
    In-process (the spark-submit zip path is covered above)."""
    import shutil

    from search_engine_spark.__main__ import main as cli_main
    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents

    idx = str(tmp_path / "fsck_idx")
    IndexBuilder(spark, idx, bucket_count=4).build(
        load_documents(spark, "/root/testdata/sf0.001")
    )
    assert cli_main(["fsck", "--index-dir", idx, "--shallow"]) == 0

    bad = str(tmp_path / "fsck_bad")
    shutil.copytree(idx, bad)
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    f = sorted(
        glob.glob(os.path.join(bad, "lexicon", "**", "*.parquet"),
                  recursive=True)
    )[0]
    t = pq.read_table(f)
    pdf = t.to_pandas()
    pdf.loc[0, "df"] = int(pdf.loc[0, "df"]) + 7
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=t.schema, preserve_index=False), f
    )
    crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert cli_main(["fsck", "--index-dir", bad, "--shallow"]) == 1
