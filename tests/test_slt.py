"""sqllogictest-style golden-file suite (reference test layer 1, SURVEY §5).

The reference runs ``tests/slt/*.slt`` through both engine generations with
CSV fixtures auto-registered by file stem
(tests/sqllogictest/src/lib.rs:10-22).  This suite reproduces that harness:
each ``tests/slt/*.slt`` file here re-authors the matching reference file's
scenarios for the Spark engine (own fixtures, rowsort where order is
unspecified) and runs through :mod:`sqlrs_spark.slt`.
"""

from __future__ import annotations

import glob
import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLT_DIR = os.path.join(REPO_ROOT, "tests", "slt")
FIXTURES = ["staff", "depts", "regions", "nums1", "nums2"]

SLT_FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))


@pytest.fixture(scope="session")
def slt_session(spark):
    from sqlrs_spark.session import Session

    session = Session(spark)
    # reference lib.rs:10-22: CSVs auto-loaded as tables named by file stem
    for name in FIXTURES:
        session.load_csv(name, os.path.join(SLT_DIR, "csv", f"{name}.csv"))
    return session


@pytest.mark.parametrize("path", SLT_FILES, ids=[os.path.basename(p) for p in SLT_FILES])
def test_slt_file(slt_session, path, monkeypatch):
    from sqlrs_spark.slt import run_slt_file

    monkeypatch.chdir(REPO_ROOT)  # slt files use repo-relative csv paths
    ran = run_slt_file(slt_session, path, labels={"spark"})
    assert ran > 0
