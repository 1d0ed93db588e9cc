"""Differential correctness under a DRIVER-SHAPED session.

`tools/check_oracle.py` uses the engine's own `get_spark`, which pins
UTC, 32 shuffle partitions, ANSI/AQE settings, etc. — the driver's gate
runs queries in a PLAIN `SparkSession.builder.getOrCreate()` that
inherits the host environment. Two defect classes already slipped
through that gap (round 4: HUGEINT oracle types; round 5: session-
timezone-dependent day boundaries), so this tool replays the driver's
shape exactly: plain session, default confs, the host timezone as-is
(run under `TZ=America/New_York ...` to harden), comparing every
registered query against its oracle with the same type-strict compare
as check_oracle.

Run:  python tools/driver_replica.py [sf_dir] [query ...]
      TZ=America/New_York python tools/driver_replica.py   # non-UTC probe

Exit 1 on any failure.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    from pyspark.sql import SparkSession

    from check_oracle import compare, compare_types, run_duckdb

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n = fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        n += 1
        t0 = time.time()
        try:
            res = fn(spark, sf_dir)
            spark_types = {f.name: f.dataType.simpleString()
                           for f in res.schema.fields}
            sdf = res.toPandas()
            odf, duck_types = run_duckdb(oracles[name], sf_dir)
            problems = (compare_types(duck_types, spark_types)
                        + compare(name, sdf, odf))
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"[:200]]
        if problems:
            fails += 1
            print(f"FAIL {name} ({time.time() - t0:.1f}s)")
            for p in problems[:3]:
                print(f"   - {p}")
    print(f"\n{n} queries under plain session "
          f"(host TZ), {fails} failed")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
