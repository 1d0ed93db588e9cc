"""Timezone invariance under a DRIVER-SHAPED session.

The local harness (`session.py::get_spark`) pins
`spark.sql.session.timeZone=UTC`, so TZ-dependent day-boundary math can
never fail locally — but the driver runs queries in a PLAIN session that
inherits the host timezone. Round 5 measured the exposure: before
`events_table` pinned the session timezone, 15 timeseries queries
(q_rate_anomaly, q_ewma, q_ols_trend, ...) silently shifted day
boundaries under TZ=America/New_York and diverged from their
timezone-free DuckDB oracles.

This test replays that exact scenario — plain session, non-UTC host
timezone, via a subprocess because the host TZ must be set before the
JVM starts — for representative formerly-failing queries and asserts
oracle equality.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one per formerly-failing shape: window anomaly (date strings), epoch-us
# passthrough, OLS over day numbers, calendar resample
PROBE_QUERIES = ["q_rate_anomaly", "q_ewma", "q_ols_trend",
                 "q_resample_ohlc"]

_PROBE = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em
from check_oracle import run_duckdb, compare, compare_types
qs = em.queries(); oracles = em.oracle_sql()
for name in %(names)r:
    res = qs[name](spark, %(sf_dir)r)
    st = {f.name: f.dataType.simpleString() for f in res.schema.fields}
    sdf = res.toPandas()
    odf, dt = run_duckdb(oracles[name], %(sf_dir)r)
    probs = compare_types(dt, st) + compare(name, sdf, odf)
    print(("FAIL " if probs else "PASS ") + name
          + ("" if not probs else ": " + probs[0][:120]))
"""


def test_plain_session_nonutc_matches_oracle(sf_dir):
    probe = _PROBE % {"repo": REPO, "names": PROBE_QUERIES,
                      "sf_dir": sf_dir}
    env = dict(os.environ, TZ="America/New_York")
    r = subprocess.run([sys.executable, "-c", probe],
                       capture_output=True, text=True, timeout=600,
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines()
             if ln.startswith(("PASS", "FAIL"))]
    assert len(lines) == len(PROBE_QUERIES), r.stdout
    assert all(ln.startswith("PASS") for ln in lines), r.stdout
