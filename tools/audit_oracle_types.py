"""Audit oracle output TYPES (not values) against the driver's
canonicalizer hazard.

Round-2 lesson: three driver ``hash_match: false`` rows
(``docs_train_test_split``, ``docs_pack_bins``, ``dq_report``) all passed
the local mirror because its ``canon()`` collapses Python int/Decimal to
the same string — but the driver canonicalizes DuckDB HUGEINT / DECIMAL
differently from BIGINT / DOUBLE. The robust invariant is therefore on
the *declared result types*: every oracle output column must land in the
safe set below (what parquet-backed Spark results produce). Any HUGEINT,
DECIMAL, UHUGEINT, or TINY/SMALL-int output is a latent driver hash-fail
even when locally green — wrap it in ``cast(... AS BIGINT/DOUBLE)``
(pattern: the ``volume_shipping`` oracle).

Type-only audit: runs each oracle with ``LIMIT 0`` semantics via
DuckDB's prepared description, so it is cheap at any SF.

Usage: python tools/audit_oracle_types.py [sf_dir]
Exit 0 = clean; exit 1 = offending columns listed.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SAFE = {
    "BIGINT",
    "DOUBLE",
    "FLOAT",
    "INTEGER",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}
def col_ok(duck_type: str) -> bool:
    t = duck_type.strip().upper()
    if t in SAFE:
        return True
    if t.endswith("[]"):  # LIST of elem
        return col_ok(t[:-2])
    if t.startswith("STRUCT(") or t.startswith("MAP("):
        inner = t[t.index("(") + 1 : -1]
        # crude but sufficient: flag if a hazardous scalar name appears
        return not re.search(r"HUGEINT|DECIMAL|UTINYINT|USMALLINT|UINTEGER|UBIGINT", inner)
    return False


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    oracles = entrymod.oracle_sql()
    for name, sql in oracles.items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            bad.append((name, "?", str(e)[:120]))
            continue
        offend = [(c, t) for c, t in cols if not col_ok(t)]
        if offend:
            print(f"FLAG {name}: " + ", ".join(f"{c}:{t}" for c, t in offend))
            bad.extend((name, c, t) for c, t in offend)
    print(f"\n{len(oracles)} oracles audited, {len(bad)} hazardous columns")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
