"""Local emulation of the driver's correctness gate: run every
__spark_entry__ queries()[name] on Spark and its oracle_sql()[name]
on DuckDB over the same sf dir; compare row counts + column names +
order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [only_query_substr]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """EXACT value normalization — no rounding. Every float-producing
    query rounds at source (CLAUDE.md invariant), so cross-engine
    floats must be bit-identical; tolerating <1e-4 drift here hid the
    r01 HUGEINT hash mismatches (VERDICT r01 #1 / ADVICE)."""
    import decimal

    if v is None:
        return "z:"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"  # intentionally != i:/f: — decimals are non-portable
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v.hex()}"
    return f"s:{v}"


# DuckDB output types that serialize identically to Spark's in the
# driver's hasher. HUGEINT (int128) / DECIMAL are NOT portable even
# when the values are equal — the r01 failure mode.
_PORTABLE_DUCK_TYPES = (
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "TIMESTAMP_NS",
)


def _nonportable_cols(rel) -> list[tuple[str, str]]:
    return [
        (name, str(t))
        for name, t in zip([d[0] for d in rel.description], rel.types)
        if str(t) not in _PORTABLE_DUCK_TYPES
    ]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]  # any number of substrings; empty = all

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check-oracles")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and not any(s in name for s in only):
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            bad_types = _nonportable_cols(rel)
            duck_rows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCK ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        if bad_types:
            failures.append((name, f"non-portable oracle types {bad_types}"))
            print(f"FAIL {name}: non-portable DuckDB output types {bad_types}")
            continue
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
            failures.append((name, f"cols {spark_cols} vs {duck_cols}"))
            print(f"FAIL {name}: column mismatch {spark_cols} vs {duck_cols}")
            continue
        if len(spark_rows) != len(duck_rows):
            failures.append((name, f"rowcount {len(spark_rows)} vs {len(duck_rows)}"))
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            continue
        # order-insensitive, column-name-sorted value compare
        s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
        d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
        s_set = sorted(
            tuple(norm(row[i]) for i in s_order) for row in (tuple(r) for r in spark_rows)
        )
        d_set = sorted(tuple(norm(row[i]) for i in d_order) for row in duck_rows)
        if s_set != d_set:
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ e.g. {diff}")
            continue
        print(f"OK   {name}: {len(spark_rows)} rows")

    print(f"\n{len(failures)} failures")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
