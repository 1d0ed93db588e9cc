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


_JAR = os.path.join(REPO, "columnar_estimator_sample_spark", "plans",
                    "jvm", "sparkgraft-ndv-ext.jar")


def test_committed_jar_matches_committed_source():
    """The jar is a committed binary: prove it is exactly what
    tools/build_jvm_extension.py produces from the committed .scala
    (scalac class output is deterministic for a fixed toolchain — the
    one PySpark bundles — so a stale or tampered jar fails here)."""
    import hashlib
    import subprocess
    import sys as _sys
    import tempfile
    import zipfile

    import pyspark

    assert os.path.exists(_JAR), \
        "extension jar missing (tools/build_jvm_extension.py)"
    src = os.path.join(os.path.dirname(_JAR), "NdvCatalogExtension.scala")
    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
    if not os.path.exists(java):
        java = "java"
    cp = ":".join(os.path.join(jars, j) for j in os.listdir(jars))
    with tempfile.TemporaryDirectory() as tmp:
        r = subprocess.run(
            [java, "-cp", cp, "scala.tools.nsc.Main", "-usejavacp",
             "-d", tmp, src], capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        built = {}
        for root, _, files in os.walk(tmp):
            for f in files:
                p = os.path.join(root, f)
                rel = os.path.relpath(p, tmp)
                built[rel] = hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
    with zipfile.ZipFile(_JAR) as z:
        jar_classes = {n: hashlib.sha256(z.read(n)).hexdigest()
                       for n in z.namelist() if n.endswith(".class")}
    assert built == jar_classes, (
        "committed sparkgraft-ndv-ext.jar does not match a fresh compile "
        "of NdvCatalogExtension.scala — rerun tools/build_jvm_extension.py")


@pytest.mark.skipif(
    not os.path.exists(_JAR),
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


_ENGINE_PROBE = r"""
import sys
sys.path.insert(0, %(repo)r)
from columnar_estimator_sample_spark.session import get_spark
from columnar_estimator_sample_spark.registry import queries
spark = get_spark("ndv_ext_probe", parallelism=4, ndv_extension=True,
                  extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1",
                              "spark.ui.enabled": "false"})
spark.sparkContext.setLogLevel("ERROR")
df = queries()["q_ndv_broadcast_join"](spark, %(sf_dir)r)
plan = df._jdf.queryExecution().executedPlan().toString()
print("PLAN broadcast" if "BroadcastHashJoin" in plan
      and "SortMergeJoin" not in plan else "PLAN other")
print("ROWS", df.count())
"""


@pytest.mark.skipif(
    not os.path.exists(_JAR),
    reason="extension jar not built (tools/build_jvm_extension.py)")
def test_engine_session_optin_drives_broadcast(sf_dir):
    """get_spark(ndv_extension=True) must load the extension, and the
    registered q_ndv_broadcast_join — which publishes the row-count
    catalog's verdict itself — must plan as pure broadcast joins even
    with the size heuristic disabled (fresh JVM: static conf)."""
    probe = _ENGINE_PROBE % {"repo": REPO, "sf_dir": sf_dir}
    r = subprocess.run([sys.executable, "-c", probe],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PLAN broadcast" in r.stdout, r.stdout
    rows = [ln for ln in r.stdout.splitlines() if ln.startswith("ROWS")]
    assert rows and int(rows[0].split()[1]) > 0, r.stdout
