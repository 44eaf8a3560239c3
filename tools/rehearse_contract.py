"""Full driver-contract rehearsal: every registry() query vs its DuckDB
oracle at sf0.01, type-sensitive (the driver hashes values, so a DuckDB
DOUBLE vs Spark LONG mismatch FAILS even when numerically equal), plus an
entry(spark) smoke — exactly what CORRECTNESS_r{N}.json will record.

Usage:  python tools/rehearse_contract.py [sf_dir] [query ...]
(query names limit the rehearsal to those registry entries and skip the
entry() smoke — the fast loop when iterating on one operator)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def norm_cell(v):
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        return ("float", round(v, 9))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    return (type(v).__name__, v)


def main():
    import duckdb

    from vite_spark.queries import registry
    from vite_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=32)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")

    reg = registry()
    only = sys.argv[2:]
    if only:
        missing = [q for q in only if q not in reg]
        if missing:
            sys.exit(f"unknown queries: {missing}")
        reg = {q: reg[q] for q in only}
    failures = []
    for name, (fn, sql) in reg.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm_cell(r[c]) for c in cols) for r in sdf.collect()
            )
            if sql is None:
                status = f"rows_only n={len(srows)}"
            else:
                rel = con.sql(sql)
                idx = [rel.columns.index(c) for c in cols]
                orows = sorted(
                    tuple(norm_cell(r[i]) for i in idx) for r in rel.fetchall()
                )
                if len(srows) != len(orows):
                    status = f"FAIL rows {len(srows)} vs {len(orows)}"
                else:
                    bad = next(
                        (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b),
                        None,
                    )
                    if bad is None:
                        status = f"ok n={len(srows)}"
                    else:
                        status = (f"FAIL row {bad}: spark={srows[bad][:4]} "
                                  f"oracle={orows[bad][:4]}")
        except Exception as e:  # noqa: BLE001 - rehearsal must report, not die
            status = f"ERROR {type(e).__name__}: {str(e)[:120]}"
        if not status.startswith(("ok", "rows_only")):
            failures.append(name)
        print(f"{name:36s} {status:40s} {time.time() - t0:6.1f}s", flush=True)

    if not only:
        import __spark_entry__ as entrymod

        df = entrymod.entry(spark)
        n = df.count()
        print(f"{'__entry__':36s} ok rows={n} "
              f"schema={[f.name for f in df.schema.fields]}")
    print(f"\n{len(reg)} queries, {len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
