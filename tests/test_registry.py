"""Registry contract tests: every query runs at sf0.001 and its oracle is
syntactically valid DuckDB SQL; spot checks differential parity for a fast
subset (the full differential suite is tools/check_oracle.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

FAST_DIFF = [
    "q01_pricing_summary", "q_semi_join", "q_rollup", "q_json_extract",
    "q_dedup_fingerprint", "q_similarity_topk",
]


def _duck(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", FAST_DIFF)
def test_differential_fast(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = _duck(ORACLES[name], sf_dir)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    s = sdf[sorted(sdf.columns)].sort_values(
        by=sorted(sdf.columns)).reset_index(drop=True)
    o = odf[sorted(odf.columns)].sort_values(
        by=sorted(odf.columns)).reset_index(drop=True)
    for c in s.columns:
        if s[c].dtype.kind == "f":
            assert (s[c].fillna(0) == o[c].astype(float).fillna(0)).all(), c
        else:
            assert s[c].astype(str).tolist() == o[c].astype(str).tolist(), c
