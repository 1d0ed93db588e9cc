"""The Catalyst-injected NDV estimator plugin (plans/jvm/) must flip the
join strategy from the NDV catalog's verdict.

`spark.sql.extensions` is a static conf — it can only be applied when the
JVM starts — so this test drives a FRESH interpreter+JVM via subprocess
instead of the shared session fixture. One subprocess proves all three
contracts: the extension class loads, an un-hinted join against a
catalog-small table plans as BroadcastHashJoin (with the size heuristic
disabled, so only the rule can be responsible), and the same join without
a catalog entry stays SortMergeJoin with identical results.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from columnar_estimator_sample_spark.plans.stats import (
    extension_jar, ndv_broadcast_conf,
)
jar = extension_jar()
spark = (SparkSession.builder.master("local[4]")
         .config("spark.jars", jar)
         .config("spark.driver.extraClassPath", jar)
         .config("spark.sql.extensions", "sparkgraft.NdvCatalogExtension")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = %(sf_dir)r

def mk():
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet")
    return (cust.join(nat, cust.c_nationkey == nat.n_nationkey)
            .select("c_name", "n_name"))

def strategy(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return "broadcast" if "BroadcastHashJoin" in p else (
        "sortmerge" if "SortMergeJoin" in p else "other")

# catalog empty -> heuristics alone (disabled) -> sort-merge
spark.conf.set("spark.graft.ndv.broadcastTables", "")
off = mk()
print("OFF", strategy(off), off.count())
# catalog marks nation broadcast-safe -> the injected rule must flip it
spark.conf.set("spark.graft.ndv.broadcastTables",
               ndv_broadcast_conf({"nation": 25, "customer": 10**9}))
on = mk()
print("ON", strategy(on), on.count())
"""


@pytest.mark.skipif(
    not os.path.exists(os.path.join(
        REPO, "columnar_estimator_sample_spark", "plans", "jvm",
        "sparkgraft-ndv-ext.jar")),
    reason="extension jar not built (tools/build_jvm_extension.py)")
def test_injected_rule_flips_join_strategy(sf_dir):
    probe = _PROBE % {"repo": REPO, "sf_dir": sf_dir}
    r = subprocess.run([sys.executable, "-c", probe],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = dict(ln.split(" ", 1) for ln in r.stdout.splitlines()
                 if ln.startswith(("ON", "OFF")))
    off_strat, off_rows = lines["OFF"].split()
    on_strat, on_rows = lines["ON"].split()
    assert off_strat == "sortmerge", r.stdout
    assert on_strat == "broadcast", r.stdout
    assert off_rows == on_rows and int(off_rows) > 0, r.stdout
