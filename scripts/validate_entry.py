"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 against its DuckDB oracle and compare
row count + column names + column TYPES (Spark dtype vs the DuckDB
relation type, via the _TYPE_MAP equivalence table) + order-insensitive
stringified values.

Usage: python scripts/validate_entry.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bloom_filters_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# Spark dtype → acceptable DuckDB type names. Anything not listed
# (e.g. DECIMAL vs double) is reported as a type mismatch so that a
# stricter driver-side schema check cannot fail where this gate passed.
_TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "binary": {"BLOB"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def types_compatible(spark_dtypes, o_names, o_types):
    """[(name, spark_dtype)] vs duckdb (names, types) → list of problems."""
    o_by_name = {n: str(t) for n, t in zip(o_names, o_types)}
    problems = []
    for name, sdt in spark_dtypes:
        odt = o_by_name.get(name)
        if odt is None:
            continue  # column-name mismatch is reported separately
        allowed = _TYPE_MAP.get(sdt)
        if allowed is None:
            problems.append(f"{name}: unmapped spark type {sdt} (duckdb {odt})")
        elif odt not in allowed:
            problems.append(f"{name}: spark {sdt} vs duckdb {odt}")
    return problems


def canon(cols, rows):
    """(sorted col names, sorted stringified row tuples)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]

    def cell(v):
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    body = sorted(tuple(cell(r[i]) for i in order) for r in rows)
    return names, body


def main() -> int:
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    spark = get_spark("validate_entry")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = list(rel.types)
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sc, sb = canon(scols, srows)
        oc, ob = canon(ocols, orows)
        type_problems = types_compatible(sdf.dtypes, ocols, otypes)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            failures.append(name)
        elif type_problems:
            print(f"FAIL {name}: dtypes {type_problems}")
            failures.append(name)
        elif len(sb) != len(ob):
            print(f"FAIL {name}: rowcount {len(sb)} vs {len(ob)}")
            failures.append(name)
        elif sb != ob:
            bad = [(a, b) for a, b in zip(sb, ob) if a != b][:5]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
            failures.append(name)
        else:
            print(f"pass {name} ({len(sb)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
