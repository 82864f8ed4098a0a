"""Catalyst extension (SURVEY §4.3): the compiled JVM rule, exercised.

The extension jar (jvm/org/sqlrs/*.java → sqlrs_spark/jvm/sqlrs-extensions.jar)
injects AliasInWhereRule, moving the reference binder's alias-in-WHERE quirk
(src/planner_v2/binder/statement/mod.rs:24-37) from the Python frontend's
regex retry into the analyzer where it belongs.

A jar + spark.sql.extensions pair only loads into a FRESH JVM, and the
pytest process shares one SparkSession across the suite — so every check
here runs in a subprocess and reports through its exit status.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "sqlrs_spark", "jvm", "sqlrs-extensions.jar")

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None, reason="no JDK to compile the extension"
)


@pytest.fixture(scope="module")
def extension_jar() -> str:
    subprocess.run(
        ["bash", os.path.join(REPO, "tools", "build_extension.sh")],
        check=True,
        capture_output=True,
    )
    assert os.path.exists(JAR)
    return JAR


def run_in_fresh_jvm(script: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_alias_in_where_resolves_via_rule(extension_jar):
    """The slt filter.slt quirk query analyzes under the JVM rule alone —
    Session's regex retry is bypassed by calling spark.sql directly."""
    proc = run_in_fresh_jvm(
        """
import sys; sys.path.insert(0, ".")
from sqlrs_spark.session import build_spark
spark = build_spark("ext_alias", jvm_extension=True)
spark.sql("CREATE OR REPLACE TEMP VIEW t1 AS SELECT * FROM VALUES (1),(2),(3) AS v(v1)")
rows = sorted(r.a for r in spark.sql("select v1+1 as a from t1 where a >= 3").collect())
assert rows == [3, 4], rows
# guard: a real column with the alias's name keeps Spark semantics
spark.sql("CREATE OR REPLACE TEMP VIEW t2 AS SELECT * FROM VALUES (1,10),(2,20) AS v(v1, a)")
rows = sorted(r.a for r in spark.sql("select v1+100 as a from t2 where a >= 20").collect())
assert rows == [102], rows
# nested expression positions substitute too
rows = sorted(
    r.a for r in spark.sql("select v1*2 as a from t1 where a + 1 >= 5 and not (a = 6)").collect()
)
assert rows == [4], rows
spark.stop()
print("OK")
"""
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_slt_corpus_green_through_extension(extension_jar):
    """The whole re-authored slt corpus passes with the extension loaded —
    the rule is a strict no-op for everything Spark already accepts."""
    proc = run_in_fresh_jvm(
        """
import glob, sys; sys.path.insert(0, ".")
from sqlrs_spark.session import Session, build_spark
from sqlrs_spark.slt import run_slt_file
spark = build_spark("ext_slt", jvm_extension=True)
session = Session(spark)
for name in ["staff", "depts", "regions", "nums1", "nums2"]:
    session.load_csv(name, f"tests/slt/csv/{name}.csv")
total = 0
for path in sorted(glob.glob("tests/slt/*.slt")):
    total += run_slt_file(session, path, labels={"spark"})
assert total > 0
spark.stop()
print(f"OK {total}")
"""
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
