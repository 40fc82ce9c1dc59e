"""Local stand-in for the driver's correctness gate: run each
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given
sf, compare row count + schema-insensitive sorted values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from zpdfspark.spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # ZPDF_ORACLE_CPUS: cross-width determinism replays — running the
    # same gate at a different core/shuffle-partition count shakes out
    # partition-order nondeterminism the fixed-width run can't see
    cpus = int(os.environ.get("ZPDF_ORACLE_CPUS", "8"))
    spark = get_spark(cpus, "oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(rows)} rows, cols={cols}")
            if not rows:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"[FAIL] {name}: column mismatch {sorted(cols)} vs {sorted(ocols)}")
            continue
        # Arrow-level type audit: the driver's value hash is
        # type-sensitive, and DuckDB's Python fetchall() hides drift
        # (HUGEINT comes back as plain int).  Compare arrow types and
        # fail hard on the known driver-red shape: decimal (HUGEINT)
        # vs integer; warn on anything else.
        try:
            import pyarrow as pa

            def _ty(t):
                # structural type string: list item field NAMES differ
                # between engines (duckdb "l" vs spark "element") with
                # no value meaning — drop them; keep struct field names
                if pa.types.is_list(t) or pa.types.is_large_list(t):
                    return f"list<{_ty(t.value_type)}>"
                if pa.types.is_struct(t):
                    return ("struct<" + ",".join(
                        f"{f.name}:{_ty(f.type)}" for f in t) + ">")
                return str(t)

            duck_schema = con.execute(sql).arrow().schema
            spark_schema = df.limit(0).toArrow().schema
            dmap = {f.name: _ty(f.type) for f in duck_schema}
            smap = {f.name: _ty(f.type) for f in spark_schema}
            for c in cols:
                st, dt = smap.get(c), dmap.get(c)
                if st == dt:
                    continue
                if "decimal" in (dt or "") and "int" in (st or ""):
                    failures.append(name)
                    print(f"[FAIL] {name}: col {c} duckdb {dt} vs "
                          f"spark {st} (uncast aggregate?)")
                    break
                print(f"[warn] {name}: col {c} type drift "
                      f"duckdb={dt} spark={st}")
            else:
                pass
            if failures and failures[-1] == name:
                continue
        except Exception as e:  # pragma: no cover - audit best-effort
            print(f"[warn] {name}: type audit skipped: {e}")
        a = normalize(rows, cols)
        b = normalize(orows, ocols)
        if len(a) != len(b):
            failures.append(name)
            print(f"[FAIL] {name}: row count {len(a)} vs {len(b)}")
        elif a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"[FAIL] {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"[OK]   {name}: {len(a)} rows match")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL ORACLES MATCH")


if __name__ == "__main__":
    main()
