"""Regression gate for cross-engine output-type drift.

Round-1 lost 3 driver hash checks to DuckDB widening integer sums to
HUGEINT (stringifies differently than Spark's BIGINT in the value
hash). tools/check_type_parity.py audits every (query, oracle) pair's
DECLARED output types without executing either side; this test keeps
the audit permanently green so the bug class can't come back.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO / "tools"))

SF = "/root/testdata/sf0.001"


def test_all_query_oracle_pairs_type_aligned(spark):
    import check_type_parity as ctp

    import __spark_entry__ as entrymod
    from monasca_aggregator_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems = []
    for name in sorted(queries):
        if name not in oracles:
            continue
        sdf = queries[name](spark, SF)
        stypes = {f.name: f.dataType.simpleString() for f in sdf.schema}
        otypes = {
            r[0]: r[1]
            for r in con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        }
        if sorted(stypes) != sorted(otypes):
            problems.append(f"{name}: column sets differ")
            continue
        for col, styp in stypes.items():
            otyp = otypes[col]
            sc = ctp._category("spark", styp)
            oc = ctp._category("duck", otyp)
            if sc != oc:
                problems.append(f"{name}.{col}: spark={styp} oracle={otyp}")
            elif otyp.lower() == "hugeint":
                problems.append(f"{name}.{col}: oracle HUGEINT (cast!)")
            elif otyp.lower().startswith("decimal"):
                problems.append(f"{name}.{col}: oracle {otyp} (cast!)")
    assert not problems, "\n".join(problems)
