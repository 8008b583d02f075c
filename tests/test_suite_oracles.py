"""Full-suite oracle parity gate (VERDICT r2 item 2).

Runs every registered suite query against its DuckDB oracle at
sf0.001 — the same comparison the driver performs at sf0.01 — so
pytest itself guards oracle parity instead of only the round driver.
Also pins the curated queries() ordering: the driver's correctness
artifact covers the first 50 entries, so that window must span all
four surfaces (timeseries / relational / ext / frontend).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_correctness import TABLES, compare


def _surface(name: str) -> str:
    if name.startswith("ts_"):
        return "ts"
    if name.startswith("rel_"):
        return "rel"
    if name.startswith("ext_"):
        return "ext"
    return "frontend"


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


class TestCuratedOrdering:
    def test_first_50_spans_all_surfaces(self):
        first50 = list(QUERIES)[:50]
        counts = {s: sum(1 for n in first50 if _surface(n) == s) for s in ("ts", "rel", "ext", "frontend")}
        assert counts["ts"] >= 10
        assert counts["rel"] >= 10
        assert counts["ext"] >= 8
        assert counts["frontend"] >= 10

    def test_first_50_all_oracled(self):
        # rows-only queries (LSH family) must not occupy a verified slot
        assert [n for n in list(QUERIES)[:50] if n not in ORACLES] == []

    def test_entry_query_is_first(self):
        assert next(iter(QUERIES)) == "ts_agg_window_mean"

    def test_curated_names_unique_and_registered(self):
        assert len(entry_mod.CURATED_FIRST_50) == 50
        assert len(set(entry_mod.CURATED_FIRST_50)) == 50

    def test_oracle_keys_subset_of_queries(self):
        assert set(ORACLES) <= set(QUERIES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES), ids=sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir, duck):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only queries: LSH hash streams with no SQL equivalent;
        # recall-tested against exact counterparts in test_ext.py
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
