"""Pins the curated driver-window prefix of the registry.

The driver's CORRECTNESS gate hashes the first 50 `queries()` entries in
dict order; round 1 shipped the flagship pipeline operators outside that
window (VERDICT r1, "Driver verification gap").  These tests keep the
prefix covering every p/t/m/s query so the gap cannot silently reopen.
"""

from __future__ import annotations

from sqlrs_spark.registry import DRIVER_WINDOW, all_specs


def test_window_names_exist_and_unique():
    specs = all_specs()
    assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in specs]
    assert not missing, f"window names not registered: {missing}"


def test_window_is_the_dict_prefix():
    names = list(all_specs())
    assert tuple(names[: len(DRIVER_WINDOW)]) == DRIVER_WINDOW
    # nothing lost: curation reorders, never drops
    assert len(names) == len(set(names))


def test_window_covers_all_pipeline_families():
    specs = all_specs()
    pipeline = {
        n
        for n in specs
        if n[0] in "ptms" and n[1].isdigit()  # p01.., t01.., m01.., s01..
    }
    outside = pipeline - set(DRIVER_WINDOW)
    assert not outside, f"pipeline queries outside the driver window: {outside}"


def test_window_entries_have_oracles_where_possible():
    # rows-only entries in the window must be the documented exceptions
    specs = all_specs()
    no_oracle = {n for n in DRIVER_WINDOW if specs[n].oracle is None}
    assert no_oracle <= {"p18_ann_ivf_kmeans"}, no_oracle
