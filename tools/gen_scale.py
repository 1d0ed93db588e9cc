"""Generate a larger benchmark scale factor by key-offset replication.

Usage: python tools/gen_scale.py [src_sf_dir] [dst_dir] [copies]

Takes the driver's sf0.1 testdata (read-only) and writes ``copies``
key-shifted unions of every table into a local (gitignored) directory —
e.g. 10 copies of sf0.1 ≈ sf1: 6M lineitem rows. Foreign keys are shifted
by the same per-copy offset, so every join stays consistent WITHIN a copy
and the relational results scale exactly 10× (same groups, 10× counts).
``region``/``nation`` are shared dimensions and copied once. Text/em-
bedding payloads are replicated as-is — which also makes the dedup tier's
sf1 run the realistic hard case (a corpus that IS 10-way duplicated).

The events table is read/written with the nanosecond-int64 ``ts`` intact
(spark.sql.legacy.parquet.nanosAsLong) so sources.tables.events_table
handles the generated directory identically to the driver's.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 100_000_000  # larger than any key in the source data

KEY_COLS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F
    from columnar_estimator_sample_spark.session import get_spark

    spark = get_spark("gen_scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(dst, exist_ok=True)

    for t in SHARED_DIMS:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: copied {df.count()} rows")

    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: wrote {copies}x{base.count()} rows")


if __name__ == "__main__":
    main()
