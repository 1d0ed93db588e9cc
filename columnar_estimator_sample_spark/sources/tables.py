"""Table access over the driver's parquet testdata.

The reference's scan layer expands a file glob and reads schema'd records
with per-column defaults (/root/reference/trainer.py:175-246). Spark globs
natively and parquet carries its schema, so a table load is one line; this
module adds the small conveniences the query suite needs (cached handles per
(session, sf_dir), temp-view registration for SQL-side queries).

Scale note: loads are plain ``spark.read.parquet`` so Catalyst column
pruning and predicate pushdown reach the scan untouched. Nothing here
materializes or collects.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# (applicationId, sf_dir, name) -> loaded handle. spark.read.parquet
# runs a small schema-inference job on the DRIVER at every call; with
# ~250 registered queries each touching 1-3 tables that is hundreds of
# pointless jobs at plan-build time. The handle is an immutable lazy
# plan, so one per (session, sf_dir, table) is always safe to share.
#
# IMMUTABILITY CONTRACT: the handle pins the parquet file listing
# captured at first read — an in-session overwrite/append to
# {sf_dir}/{name}.parquet is invisible for the rest of the application.
# The driver's testdata dirs are immutable per session, so this is the
# intended semantics; a test that rewrites a table in place must call
# :func:`reset_handles` after writing. The same contract covers the
# operator-level derived caches (IVF coarse assignments, ER pair/entity
# frames, set-join contractions, ...): they memoize locally-checkpointed
# frames built FROM these handles, so they go stale — and pin executor
# blocks — exactly when the handles do. They register themselves below
# via :func:`register_memo` and are cleared by the same call.
_HANDLES: dict[tuple[str, str, str], DataFrame] = {}

# Operator-level memo dicts keyed by (applicationId, sf_dir[, ...]).
# Each operator module owning a per-session memo registers it here at
# import time so reset_handles() is the ONE cache-invalidation point.
_MEMOS: list[dict] = []

# Scratch directories created by materializing operators (the IVF
# inverted file, the corpus export landing). Each is one mkdtemp per
# (session, sf_dir); without tracking, a long-lived session iterating
# sf_dirs — exactly the use case reset_handles() serves — would leak a
# full parquet copy per iteration. reset_handles() removes them with
# the memos that point at them; an atexit hook sweeps whatever is left
# when the interpreter exits.
_TEMPDIRS: list[str] = []


def register_tempdir(path: str) -> str:
    """Track a mkdtemp scratch dir for removal by :func:`reset_handles`
    (and at interpreter exit). Returns ``path`` for one-line use."""
    _TEMPDIRS.append(path)
    return path


def _sweep_tempdirs() -> None:
    import shutil
    while _TEMPDIRS:
        shutil.rmtree(_TEMPDIRS.pop(), ignore_errors=True)


atexit.register(_sweep_tempdirs)


def register_memo(memo: dict) -> dict:
    """Register an operator-level memo dict for clearing alongside the
    table handles (see the immutability contract on ``_HANDLES``).
    Returns the dict for one-line ``_X_MEMO = register_memo({})`` use."""
    _MEMOS.append(memo)
    return memo


def reset_handles() -> None:
    """Drop every cached table handle AND every registered operator memo
    (see the immutability contract on ``_HANDLES``): the next
    :func:`table` call re-reads the parquet listing, and derived caches
    (IVF/ER/set-join/...) rebuild from the fresh handles. For tests that
    rewrite a testdata table in place, and as the release hook for
    long-lived sessions iterating several sf_dirs (each memo otherwise
    pins its locally-checkpointed blocks for the application lifetime).
    Scratch dirs the memos point at (IVF bucketed tables, the corpus
    export landing) are removed too — the memo was the only live
    reference to those files."""
    _HANDLES.clear()
    for m in _MEMOS:
        m.clear()
    _sweep_tempdirs()


def parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTERS — a driver-side metadata read,
    never a Spark job (the plan-build zero-jobs gate stays intact). The
    scale-adaptive parameter derivations (IVF NLIST ~ sqrt(N), the
    ccnet window/histogram switch) size themselves from this; at 100 TB
    the same number comes from the table catalog's stats."""
    import pyarrow.parquet as pq
    import os as _os
    if _os.path.isdir(path):
        return sum(
            pq.ParquetFile(_os.path.join(r, f)).metadata.num_rows
            for r, _, fs in _os.walk(path) for f in fs
            if f.endswith(".parquet"))
    return pq.ParquetFile(path).metadata.num_rows


def parquet_col_max(path: str, col: str) -> int:
    """Column MAX from parquet footer statistics — the same driver-side
    metadata-read discipline as :func:`parquet_num_rows` (zero Spark
    jobs; at 100 TB the catalog's column stats supply this). Raises if
    any row group lacks statistics for ``col`` rather than silently
    under-reporting."""
    import pyarrow.parquet as pq
    import os as _os
    files = ([_os.path.join(r, f) for r, _, fs in _os.walk(path)
              for f in sorted(fs) if f.endswith(".parquet")]
             if _os.path.isdir(path) else [path])
    best = None
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"no min/max statistics for {col} in {fp} "
                    f"row group {rg}")
            best = st.max if best is None else max(best, st.max)
    if best is None:
        raise ValueError(f"no row groups with statistics in {path}")
    return best


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy; no action after
    the first schema read per session/table)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _HANDLES.get(key)
    if df is None:
        if name == "events":
            df = events_table(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _HANDLES[key] = df
    return df


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with nanosecond-timestamp handling.

    The events parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which
    Spark's parquet reader rejects outright; with the legacy flag it
    surfaces as a raw int64 nanosecond count — which we keep, deriving
    ``us`` (epoch microseconds, ``ts div 1000``, matching DuckDB's
    truncation to TIMESTAMP) and a µs-precision ``ts`` restated as the
    original wall-clock instant. Working in integer µs keeps every
    downstream computation exact and independent of the session timezone
    (the reference stores trace times the same way — raw int64 µs,
    /root/reference/README.md:93,107).

    The session timezone is pinned to UTC here for the same reason the
    nanos flag is: downstream queries convert µs -> timestamp -> date
    (timestamp_micros/to_date), and those conversions read the SESSION
    timezone while the DuckDB oracles' epoch arithmetic is timezone-free.
    Under a plain session on a non-UTC machine, 15+ timeseries queries
    silently shift day boundaries (measured: TZ=America/New_York flips
    q_rate_anomaly/q_ewma/q_ols_trend/... red). Pinning at the single
    funnel every events read goes through makes the whole tier
    environment-independent — in any session, any host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = (df.withColumnRenamed("ts", "ts_ns")
              .withColumn("us", F.expr("ts_ns div 1000")))
    else:  # future-proof: already a timestamp type
        df = df.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register testdata tables as temp views for ``spark.sql`` queries."""
    for name in names or TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


# (applicationId, analyzed-plan semanticHash) -> probed split count.
# fanout()'s `df.rdd.getNumPartitions()` probe is not free: under AQE it
# materializes the plan driver-side, and when the input subtree contains
# a shuffle it EXECUTES those upstream stages at DataFrame-BUILD time
# (r14 measured this on the reverted media-feed placements). Every bench
# pass and oracle re-check rebuilds the same frames, so memoizing on the
# analyzed plan's semantic hash makes all but the first probe per
# (session, plan) free. Registered so reset_handles() clears it with the
# table handles it derives from.
_FANOUT_SPLITS: dict[tuple[str, int], int] = register_memo({})


def fanout(df: DataFrame) -> DataFrame:
    """Fan a frame out to the session's core count when its scan yields
    fewer splits — one small parquet file locally, a few huge files on a
    cluster — so per-row kernels (md5 shingles, minhash, proto decode)
    run full-width instead of on a handful of tasks. A narrow
    round-robin shuffle of the PROJECTED columns; a no-op whenever the
    source already has healthy split counts (any real 100 TB scan).
    Placement-only: every downstream aggregate in this engine is
    order-free (exact integer/decimal lanes), so results are unchanged.

    CAVEAT (eager probe): the split-count probe touches ``df.rdd``,
    which under AQE materializes the physical plan and — whenever the
    input subtree contains an exchange — runs those upstream stages at
    BUILD time. Prefer placing fanout directly on scan-rooted frames;
    the per-(session, plan) memo below caps the cost at one probe for
    repeated builds either way.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    key = (sc.applicationId,
           df._jdf.queryExecution().analyzed().semanticHash())
    n = _FANOUT_SPLITS.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _FANOUT_SPLITS[key] = n
    if n < par:
        return df.repartition(par)
    return df
