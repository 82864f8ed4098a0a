"""Checkpoint recovery: the exactly-once property Structured Streaming
actually promises.

A windowed aggregation is killed mid-stream (after at least one micro-batch,
before the last) and restarted from the SAME checkpoint over the same
source. If state restore or source offset tracking dropped or replayed
anything, the recovered aggregate diverges from the batch twin computed on
the same rows — count AND decimal-exact value sums would both show it.
"""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F

from sqlrs_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_dir):
    """events as a directory of small files so maxFilesPerTrigger can slice
    the bounded source into several micro-batches."""
    out = tempfile.mkdtemp(prefix="sqlrs_stream_src_") + "/events"
    load_table(spark, sf_dir, "events").repartition(8).write.mode("overwrite").parquet(out)
    return out


def _agg(df):
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
    )


def _start(spark, src_dir, ckpt, name):
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return (
        _agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_aggregation_survives_kill_and_restart(spark, multi_file_events):
    ckpt = tempfile.mkdtemp(prefix="sqlrs_ckpt_")

    # phase 1: process SOME batches, then kill mid-stream
    q1 = _start(spark, multi_file_events, ckpt, "rec_phase1")
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        done = len(q1.recentProgress)
        if done >= 2:
            break
        if not q1.isActive:  # finished before we could kill it — still valid
            break
        time.sleep(0.2)
    was_active = q1.isActive
    q1.stop()
    q1.awaitTermination()
    batches_before = len(q1.recentProgress)

    # phase 2: restart from the SAME checkpoint, run to completion
    q2 = _start(spark, multi_file_events, ckpt, "rec_phase2")
    q2.awaitTermination()

    recovered = {
        r.event_type: (r.n, r.total) for r in spark.table("rec_phase2").collect()
    }
    expected = {
        r.event_type: (r.n, r.total)
        for r in _agg(spark.read.parquet(multi_file_events)).collect()
    }
    assert recovered == expected, (
        f"recovered aggregate diverged after kill@batch{batches_before}"
        f" (was_active={was_active}): {recovered} != {expected}"
    )
    # the restart must RESUME, not reprocess everything: with 8 source
    # files at 1 file/trigger, phase 2 sees only the remainder
    if was_active and batches_before >= 2:
        assert len(q2.recentProgress) < 8
