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
