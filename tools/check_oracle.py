"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every queries() entry at a given sf_dir, runs the matching
oracle_sql() in DuckDB over the same parquet, and compares:
row count, sorted column names, dtype compatibility, and an
order-insensitive value hash (rows sorted, values canonicalized).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from bangumi_notion_data_integration_project_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    ran = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"okro {name}: rows-only ({len(srows)} rows, {spark_t:.1f}s) [no oracle]")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = [c.lower() for c in orel.columns]
            orows = [tuple(r) for r in orel.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        sc = sorted(c.lower() for c in scols)
        oc = sorted(ocols)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} duck={oc}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            failures.append(name)
            continue
        sh, slines = frame_fingerprint([c.lower() for c in scols], srows)
        oh, olines = frame_fingerprint(ocols, orows)
        if sh != oh:
            ndiff = sum(1 for a, b in zip(slines, olines) if a != b)
            print(f"FAIL {name}: value hash mismatch ({ndiff}/{len(slines)} rows differ)")
            for a, b in list(zip(slines, olines))[:200]:
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows hash={sh} ({spark_t:.1f}s)")
    print(f"\n{ran - len(failures)}/{ran} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
