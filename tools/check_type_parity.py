"""Cross-engine output-type parity audit for every (query, oracle) pair.

The driver's value hash stringifies each cell; a column that is BIGINT
in Spark but HUGEINT/DOUBLE in DuckDB (e.g. DuckDB's sum() over an
integer column widens to INT128, and some client paths then render it
as a float) hashes differently even when the values are equal.  This
tool compares the *declared* output type of every column on both sides
without executing anything: Spark gives the schema from the lazy plan,
DuckDB from DESCRIBE over the oracle SQL.

Usage: python tools/check_type_parity.py [sf_dir]
Exit 1 if any pair has a type-category mismatch.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import __spark_entry__ as entrymod  # noqa: E402
from monasca_aggregator_spark.session import get_spark  # noqa: E402
from monasca_aggregator_spark.sources.tables import TABLES  # noqa: E402


def _category(engine: str, typ: str) -> str:
    """Collapse a type name to the category that matters for the
    stringified value hash: int / float / bool / ts / date / str."""
    t = typ.lower()
    if engine == "duck":
        if t in ("tinyint", "smallint", "integer", "bigint", "hugeint",
                 "utinyint", "usmallint", "uinteger", "ubigint"):
            # HUGEINT is int-category but flagged separately below
            return "int"
        if t in ("float", "double", "real") or t.startswith("decimal"):
            return "float"
        if t == "boolean":
            return "bool"
        if t.startswith("timestamp"):
            return "ts"
        if t == "date":
            return "date"
        return "str" if t == "varchar" else t
    # spark simpleString dtypes
    if t in ("tinyint", "smallint", "int", "bigint", "long"):
        return "int"
    if t in ("float", "double") or t.startswith("decimal"):
        return "float"
    if t == "boolean":
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t == "date":
        return "date"
    return "str" if t == "string" else t


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark("type-parity")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    bad = 0
    for name in sorted(queries):
        if name not in oracles:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema}
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERR {e}")
            bad += 1
            continue
        try:
            desc = con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERR {str(e).splitlines()[0]}")
            bad += 1
            continue
        otypes = {r[0]: r[1] for r in desc}
        if sorted(stypes) != sorted(otypes):
            print(f"{name:28s} COLS spark={sorted(stypes)} oracle={sorted(otypes)}")
            bad += 1
            continue
        issues = []
        for col, styp in stypes.items():
            otyp = otypes[col]
            sc, oc = _category("spark", styp), _category("duck", otyp)
            if sc != oc:
                issues.append(f"{col}: spark={styp} oracle={otyp}")
            elif otyp.lower() == "hugeint":
                issues.append(f"{col}: oracle HUGEINT (cast to BIGINT)")
            elif otyp.lower().startswith("decimal"):
                issues.append(f"{col}: oracle {otyp} (cast to DOUBLE)")
        if issues:
            print(f"{name:28s} TYPE " + "; ".join(issues))
            bad += 1
    spark.stop()
    print(f"\n{bad} pairs with type-parity issues")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
