"""Local replica of the driver's correctness gate: run every catalog
query on Spark and its oracle on DuckDB at a given SF, compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, ".")


def canon(value):
    """Canonicalize a cell for cross-engine comparison (mirror of what
    a sane driver does: stringify, round floats)."""
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.9g}"
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, list):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return str(value)


def table_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif table_hash(scols, srows) != table_hash(ocols, orows):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
            srt = sorted(srows)[:3]
            ort = sorted(orows)[:3]
            print(f"      spark  sample: {srt}")
            print(f"      oracle sample: {ort}")
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
    n_run = len([n for n in queries if not only or n in only])
    print(f"\n{len(failures)} failures / {n_run} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
