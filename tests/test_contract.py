"""Driver-contract parity: every Spark query vs its DuckDB oracle at
sf0.001 (fast) — mirrors the driver's CORRECTNESS check (row count +
order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from search_engine_spark.contract import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype(np.float64).round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif "datetime" in str(df[c].dtype):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_NAMES = [n for n, e in REGISTRY.items() if e["sql"] is not None]


@pytest.mark.parametrize("name", SQL_NAMES)
def test_contract_parity(spark, name):
    entry = REGISTRY[name]
    got = canon(entry["spark"](spark, SF_DIR).toPandas())
    want = canon(duck_run(entry["sql"]))
    assert list(got.columns) == list(want.columns), (
        got.columns,
        want.columns,
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_rows_only_entries(spark):
    for name, entry in REGISTRY.items():
        if entry["sql"] is None:
            df = entry["spark"](spark, SF_DIR)
            assert df.count() >= 0
            assert df.schema is not None


def test_nonempty_results(spark):
    """Queries that should produce signal at sf0.001 actually do."""
    for name in [
        "term_tf",
        "lexicon_df",
        "bm25_disjunctive",
        "bm25_conjunctive",
        "minhash_signatures",
        "simhash",
        "ann_cosine_topk",
        "events_hourly",
    ]:
        got = REGISTRY[name]["spark"](spark, SF_DIR)
        assert got.count() > 0, name
