"""Compile the Catalyst NDV-extension jar OFFLINE.

Uses the Scala 2.13 compiler jars that PySpark itself ships (no sbt, no
network): scala.tools.nsc.Main with -usejavacp against the full pyspark
jar directory, then `jar cf`. Output:
``columnar_estimator_sample_spark/plans/jvm/sparkgraft-ndv-ext.jar``
(committed, so a fresh checkout does not need to rebuild; rerun this
tool after editing NdvCatalogExtension.scala).

Run:  python tools/build_jvm_extension.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile


def jar_dir() -> str:
    import pyspark
    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jvm_dir = os.path.join(repo, "columnar_estimator_sample_spark",
                           "plans", "jvm")
    src = os.path.join(jvm_dir, "NdvCatalogExtension.scala")
    out_jar = os.path.join(jvm_dir, "sparkgraft-ndv-ext.jar")
    jars = jar_dir()
    java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
    if not os.path.exists(java):
        java = "java"

    with tempfile.TemporaryDirectory() as tmp:
        classes = os.path.join(tmp, "classes")
        os.makedirs(classes)
        compiler_cp = ":".join(
            os.path.join(jars, j) for j in os.listdir(jars))
        cmd = [java, "-cp", compiler_cp, "scala.tools.nsc.Main",
               "-usejavacp", "-d", classes, src]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout)
            print(r.stderr, file=sys.stderr)
            return 1
        jar_tool = shutil.which("jar") or os.path.join(
            os.environ.get("JAVA_HOME", ""), "bin", "jar")
        r = subprocess.run([jar_tool, "cf", out_jar, "-C", classes, "."],
                           capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stderr, file=sys.stderr)
            return 1
    print(f"built {out_jar} ({os.path.getsize(out_jar)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
