"""Statistics & cardinality estimation — the engine's north-star module.

The reference hard-codes a per-column distinct-value catalog
(/root/reference/trainer.py:91-118 ``vocab_size``) and consumes it to size
physical structures (hash buckets = NDV*5, trainer.py:264). This module is
the Spark-native generalization:

  * :func:`ndv_catalog` computes the catalog from data with
    ``approx_count_distinct`` (HyperLogLog++) — one pass, mergeable
    sketches, the only approach that works at 100 TB (exact distinct for
    verification at test scale via ``exact=True``).
  * :func:`analyze_tables` persists column-level stats into the session
    catalog (``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``) where
    Catalyst's cost-based optimizer consumes distinctCount/min/max/nulls
    for join reordering and build-side selection
    (``spark.sql.cbo.enabled`` is on in session.py).
  * :func:`estimation_report` extracts estimated-vs-actual row counts from
    the optimized plan (``explain("cost")`` machinery) so estimator
    quality is observable, mirroring how the reference surfaces pipeline
    statistics through its profiler hook (trainer.py:328-350).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ndv_catalog(df: DataFrame, cols: list[str] | None = None,
                exact: bool = False, rsd: float = 0.02) -> dict[str, int]:
    """Per-column NDV catalog (the ``vocab_size`` dict, computed not
    hand-maintained). HLL++ sketches by default; exact for tests."""
    cols = cols or df.columns
    if exact:
        aggs = [F.countDistinct(c).alias(c) for c in cols]
    else:
        aggs = [F.approx_count_distinct(c, rsd).alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c]) for c in cols}


def hash_bucket_sizes(catalog: dict[str, int],
                      multiplier: int = 5) -> dict[str, int]:
    """The reference's sizing rule: buckets = NDV * 5 (trainer.py:264)."""
    return {c: ndv * multiplier for c, ndv in catalog.items()}


def analyze_tables(spark: SparkSession, names: list[str],
                   columns: dict[str, list[str]] | None = None) -> None:
    """Persist table + column statistics for CBO. Tables must be saved in
    the session catalog (saveAsTable) first."""
    for name in names:
        cols = (columns or {}).get(name)
        col_clause = f" FOR COLUMNS {', '.join(cols)}" if cols else " FOR ALL COLUMNS"
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{col_clause}")


# Table property naming the corpus directory a catalog table was built
# from. Set it when registering/ANALYZEing a corpus copy so plan-time
# consumers (dedup.duplication_estimate, textstats' lane switch) can
# prove the session-global name matches THEIR sf_dir.
CORPUS_DIR_PROP = "ces.sf_dir"


def corpus_table_matches(spark: SparkSession, name: str,
                         sf_dir: str) -> bool:
    """Identity guard for a session-global catalog table standing in for
    a corpus table: True only when the table provably derives from THIS
    ``sf_dir`` — either it carries the :data:`CORPUS_DIR_PROP` table
    property (set by whoever saved/ANALYZEd it), or its storage location
    resolves inside ``sf_dir`` (an external table over the corpus
    parquet itself). Row-count equality alone is NOT identity: two
    corpora with equal counts but different content (a genuine sf1 vs a
    replicated mirror) would otherwise hand a consumer the wrong NDV.
    Metadata-only — never runs a job."""
    import os
    want = os.path.abspath(sf_dir)
    try:
        props = {r.key: r.value for r in
                 spark.sql(f"SHOW TBLPROPERTIES {name}").collect()}
        tagged = props.get(CORPUS_DIR_PROP)
        if tagged is not None:
            return os.path.abspath(tagged) == want
    except Exception:
        pass  # temp view or pre-property table: try the location probe
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        loc = next((r.data_type for r in rows
                    if r.col_name == "Location"), "")
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        return bool(loc) and os.path.abspath(loc).startswith(want + os.sep)
    except Exception:
        return False


def catalog_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """Read back persisted stats (rowCount, sizeInBytes, per-column NDV)
    from DESCRIBE EXTENDED output."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    out = {}
    for r in rows:
        if r.col_name == "Statistics":
            out["table"] = r.data_type
    return out


def column_stats(spark: SparkSession, table: str, column: str) -> dict[str, str]:
    rows = spark.sql(
        f"DESCRIBE TABLE EXTENDED {table} {column}").collect()
    return {r.info_name: r.info_value for r in rows}


_EST_RE = re.compile(r"Statistics\(([^)]*)\)")


def estimation_report(df: DataFrame) -> list[str]:
    """Estimated statistics per optimized-plan node (sizeInBytes, and —
    with CBO stats present — rowCount). The observability surface for
    estimator quality: compare against ``df.count()`` per stage."""
    plan = df._jdf.queryExecution().stringWithStats()
    return _EST_RE.findall(plan)


def actual_vs_estimated(df: DataFrame) -> dict[str, object]:
    """One-line estimator-quality probe for a DataFrame: optimizer row
    estimate of the root node (if available) vs the executed count."""
    ests = estimation_report(df)
    root = ests[0] if ests else None
    m = re.search(r"rowCount=(\d+)", root or "")
    return {
        "estimated_rows": int(m.group(1)) if m else None,
        "actual_rows": df.count(),
        "root_stats": root,
    }


# --- Catalyst-injected estimator plugin (JVM side) ---------------------
# The literal "custom cardinality estimator plugin" of the north star:
# plans/jvm/NdvCatalogExtension.scala is a Scala SparkSessionExtensions
# rule (compiled offline against PySpark's own jars into
# plans/jvm/sparkgraft-ndv-ext.jar by tools/build_jvm_extension.py) that
# reads `spark.graft.ndv.broadcastTables` and rewrites un-hinted joins
# against those tables to BROADCAST — so the NDV catalog drives build-
# side selection inside Catalyst itself, independent of file-size
# heuristics. tests/test_jvm_extension.py proves the plan flip
# (SortMergeJoin -> BroadcastHashJoin) in a fresh JVM.

#: broadcast a table when the NDV catalog bounds its row count below
#: this (dimension tables here: nation=25, region=5, supplier=10k/sf)
NDV_BROADCAST_MAX_ROWS = 1_000_000


def extension_jar() -> str:
    """Path of the committed extension jar (see tools/build_jvm_extension.py)."""
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "jvm", "sparkgraft-ndv-ext.jar")


def ndv_broadcast_conf(row_counts: dict[str, int],
                       max_rows: int = NDV_BROADCAST_MAX_ROWS) -> str:
    """Derive `spark.graft.ndv.broadcastTables` from a table->rowcount
    catalog (e.g. {t: table(spark, sf, t).count()} refreshed alongside
    :func:`ndv_catalog`): the comma-separated names whose catalogued
    cardinality is broadcast-safe."""
    return ",".join(sorted(t for t, n in row_counts.items()
                           if n <= max_rows))
