"""Optional Iceberg persistence: exercised only when the Iceberg
runtime jar is on the Spark classpath (not shipped in this sandbox —
the test documents the skip; the parquet layout is the tested default).
"""

import os
import shutil
import tempfile

import pytest


def _iceberg_jar_available() -> bool:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    try:
        return any("iceberg" in j for j in os.listdir(jars))
    except OSError:
        return False


def test_iceberg_config_validation(spark):
    from search_engine_spark.build import IndexBuilder

    d = tempfile.mkdtemp(prefix="seidx_ice_")
    try:
        with pytest.raises(ValueError, match="catalog"):
            IndexBuilder(spark, d, table_format="iceberg")
        with pytest.raises(ValueError, match="not configured"):
            IndexBuilder(spark, d, table_format="iceberg", catalog="nosuch")
        with pytest.raises(ValueError, match="table_format"):
            IndexBuilder(spark, d, table_format="orc")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_iceberg_dispatch_without_runtime(spark, monkeypatch, tmp_path):
    """Test double for the Iceberg path (runtime jar absent in this
    sandbox): a fake catalog conf plus recorded writeTo/table/sql calls
    assert the full dispatch surface — _write drives
    writeTo(<cat>.<ns>.<stage>).using('iceberg').partitionedBy(...)
    .createOrReplace() and leaves the _SUCCESS sentinel, _read resolves
    spark.table(<cat>.<ns>.<stage>), and _record_stage harvests lineage
    from the <table>.files metadata table into the manifest + lineage
    parquet."""
    from search_engine_spark.build import IndexBuilder

    calls = {"sql": [], "read": [], "write": None, "chain": []}

    class FakeWriter:
        def using(self, fmt):
            calls["chain"].append(("using", fmt))
            return self

        def partitionedBy(self, *cols):
            calls["chain"].append(("partitionedBy", len(cols)))
            return self

        def createOrReplace(self):
            calls["chain"].append(("createOrReplace",))

    def fake_write_to(self, name):
        calls["write"] = name
        return FakeWriter()

    monkeypatch.setattr(spark, "sql", lambda q, **kw: calls["sql"].append(q))
    probe = spark.range(1)
    monkeypatch.setattr(type(probe), "writeTo", fake_write_to)
    spark.conf.set("spark.sql.catalog.icefake", "fake.Catalog")
    try:
        idx = str(tmp_path / "idx")
        b = IndexBuilder(
            spark, idx, table_format="iceberg", catalog="icefake"
        )
        assert any("CREATE NAMESPACE" in q for q in calls["sql"])
        assert b._table_name("lexicon") == "icefake.search_engine.lexicon"

        df = spark.range(4).selectExpr("id as doc_id", "id % 2 as bucket")
        b._write(df, "lexicon", partition_by=["bucket"], sort_cols=["doc_id"])
        assert calls["write"] == "icefake.search_engine.lexicon"
        assert calls["chain"] == [
            ("using", "iceberg"),
            ("partitionedBy", 1),
            ("createOrReplace",),
        ]
        assert os.path.exists(os.path.join(idx, "lexicon", "_SUCCESS"))

        files_meta = spark.createDataFrame(
            [("f1.parquet", 3, 120), ("f2.parquet", 1, 40)],
            "file_path string, record_count long, file_size_in_bytes long",
        )
        snapshots_meta = spark.createDataFrame(
            [(111, 1_000), (222, 2_000)],
            "snapshot_id long, committed_at long",
        )

        def fake_table(name):
            calls["read"].append(name)
            if name.endswith(".files"):
                return files_meta
            if name.endswith(".snapshots"):
                return snapshots_meta
            return df

        monkeypatch.setattr(spark, "table", fake_table)
        assert b._read("lexicon") is df
        assert calls["read"][-1] == "icefake.search_engine.lexicon"

        manifest = {"stages": {}, "config": {}}
        b._record_stage(manifest, "lexicon", 1.5, inputs=["chunks"])
        assert any(r.endswith(".files") for r in calls["read"])
        entry = manifest["stages"]["lexicon"]
        assert entry["rows"] == 4 and entry["files"] == 2
        assert entry["bytes"] == 160 and entry["inputs"] == ["chunks"]
        # the LATEST committed snapshot becomes the durable marker
        assert entry["snapshot_id"] == 222
        lineage = os.path.join(idx, "lineage", "lexicon.parquet")
        assert os.path.exists(lineage)
        import pyarrow.parquet as pq

        t = pq.read_table(lineage)
        assert t.num_rows == 2
        assert set(t.column_names) == {"stage", "file", "rows", "bytes"}
    finally:
        spark.conf.unset("spark.sql.catalog.icefake")


@pytest.mark.skipif(
    not _iceberg_jar_available(),
    reason="iceberg-spark-runtime jar not on the classpath in this sandbox",
)
def test_iceberg_build_and_query(tmp_path):
    """Full build + query against a hadoop catalog (runs wherever the
    Iceberg jar is present)."""
    from pyspark.sql import SparkSession

    from search_engine_spark.build import IndexBuilder
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.query import QueryEngine

    wh = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-test")
        .config(
            "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", wh)
        .getOrCreate()
    )
    try:
        d = str(tmp_path / "idx")
        docs = load_documents(spark, "/root/testdata/sf0.001")
        IndexBuilder(
            spark, d, table_format="iceberg", catalog="ice", bucket_count=4
        ).build(docs, resume=False)
        qe = QueryEngine(spark, d)
        rows = qe.search("spark query", mode="disjunctive").collect()
        assert len(rows) > 0
    finally:
        spark.stop()


def test_iceberg_snapshot_gated_resume_after_kill(spark, monkeypatch, tmp_path):
    """Resume semantics the north rule asks for ('restarts from the
    last committed Iceberg snapshot'), under the local double: a FRESH
    builder on a machine with NO local _SUCCESS sentinels must treat a
    stage as done iff the manifest's recorded snapshot_id still exists
    in the table's snapshot log — and re-run it when the table was
    replaced/truncated since (snapshot gone)."""
    import json

    from search_engine_spark.build import IndexBuilder

    spark.conf.set("spark.sql.catalog.icefake", "fake.Catalog")
    monkeypatch.setattr(spark, "sql", lambda q, **kw: None)
    try:
        idx = str(tmp_path / "idx")
        snapshots = {"lexicon": [111, 222]}

        def fake_table(name):
            stage = name.split(".")[-2] if name.endswith(".snapshots") else None
            if name.endswith(".snapshots"):
                ids = snapshots.get(stage)
                if ids is None:
                    raise RuntimeError(f"no such table {name}")
                return spark.createDataFrame(
                    [(i, 1000 + i) for i in ids],
                    "snapshot_id long, committed_at long",
                )
            raise AssertionError(f"unexpected table read {name}")

        monkeypatch.setattr(spark, "table", fake_table)
        b = IndexBuilder(spark, idx, table_format="iceberg", catalog="icefake")
        manifest = {
            "stages": {"lexicon": {"rows": 4, "snapshot_id": 222}},
            "config": {},
        }
        # simulate the kill: persist the manifest, then a FRESH builder
        # with no local stage dirs/sentinels anywhere
        import os as _os

        _os.makedirs(idx, exist_ok=True)
        with open(_os.path.join(idx, "_manifest.json"), "w") as f:
            json.dump(manifest, f)
        b2 = IndexBuilder(spark, idx, table_format="iceberg", catalog="icefake")
        m2 = b2._load_manifest()
        assert not _os.path.exists(_os.path.join(idx, "lexicon", "_SUCCESS"))
        assert b2._stage_done(m2, "lexicon") is True  # snapshot present

        # table truncated/replaced since: recorded snapshot vanished
        snapshots["lexicon"] = [333]
        assert b2._stage_done(m2, "lexicon") is False

        # table dropped entirely: metadata read raises -> not done
        del snapshots["lexicon"]
        assert b2._stage_done(m2, "lexicon") is False

        # manifest entry without snapshot_id (older layout): not done
        m2["stages"]["lexicon"].pop("snapshot_id")
        snapshots["lexicon"] = [222]
        assert b2._stage_done(m2, "lexicon") is False
    finally:
        spark.conf.unset("spark.sql.catalog.icefake")
