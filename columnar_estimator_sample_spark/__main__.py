"""Command-line dispatch: run any registered query by name.

The reference is driven the same way — a CLI flag names the dataset
function and ``getattr`` dispatches to it
(/root/reference/trainer.py:181-182,515: ``--dataset_function`` /
``ARGS.dataset_function``). This is that surface for the Spark engine:

    python -m columnar_estimator_sample_spark list
    python -m columnar_estimator_sample_spark run q01_pricing_summary
    python -m columnar_estimator_sample_spark run q_dedup_minhash_lsh \
        --sf-dir /root/testdata/sf0.01 --limit 10
    python -m columnar_estimator_sample_spark run q03_shipping_priority \
        --explain --out /tmp/q03.json
    python -m columnar_estimator_sample_spark oracle q01_pricing_summary

``run`` prints the result as a table (or writes JSON/parquet with
``--out``, format by extension), ``--explain`` prints the formatted
physical plan instead of executing, and ``oracle`` prints the query's
DuckDB twin SQL so users can eyeball or port it.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m columnar_estimator_sample_spark",
        description="Run registered engine queries by name.")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered query names")

    run = sub.add_parser("run", help="execute one query")
    run.add_argument("name")
    run.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    run.add_argument("--limit", type=int, default=20,
                     help="rows printed to stdout (ignored with --out)")
    run.add_argument("--out", default=None,
                     help="write result to .json or .parquet instead")
    run.add_argument("--explain", action="store_true",
                     help="print the formatted plan, don't execute")
    run.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"))

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("name")

    sq = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL over the registered views "
                    "(region nation customer supplier part orders "
                    "lineitem events documents embeddings)")
    sq.add_argument("query")
    sq.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    sq.add_argument("--limit", type=int, default=20)
    sq.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"))
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from columnar_estimator_sample_spark import registry

    if args.cmd == "list":
        qs, oracles = registry.queries(), registry.oracle_sql()
        for name in sorted(qs):
            tag = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if args.cmd == "oracle":
        sql = registry.oracle_sql().get(args.name)
        if sql is None:
            known = args.name in registry.queries()
            print(f"{'rows-only query' if known else 'unknown query'}:"
                  f" {args.name}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    if args.cmd == "sql":
        from columnar_estimator_sample_spark.session import get_spark
        from columnar_estimator_sample_spark.sources.tables import (
            register_views)
        spark = get_spark("cli:sql", parallelism=int(args.cpus))
        spark.sparkContext.setLogLevel("ERROR")
        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0

    qs = registry.queries()
    if args.name not in qs:
        print(f"unknown query: {args.name} (try `list`)", file=sys.stderr)
        return 1
    from columnar_estimator_sample_spark.session import get_spark
    spark = get_spark(f"cli:{args.name}", parallelism=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        if args.out.endswith(".parquet"):
            df.coalesce(1).write.mode("overwrite").parquet(args.out)
        elif args.out.endswith(".json"):
            # one JSON object per line, single file, driver-side small
            pdf = df.toPandas()
            pdf.to_json(args.out, orient="records", lines=True,
                        date_format="iso")
        else:
            print("--out must end in .json or .parquet", file=sys.stderr)
            return 1
        print(f"wrote {args.out}")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
