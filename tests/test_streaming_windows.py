"""Streaming windowed aggregation + stateful sessionization."""

import time

from pyspark.sql import functions as F

from baram_spark.streaming.windows import sessionize, windowed_counts


def _events_stream(spark, tmp_path, name="ev"):
    src = str(tmp_path / name)
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src), src


def test_windowed_counts_match_batch(spark, tmp_path):
    stream, src = _events_stream(spark, tmp_path)
    q = (
        windowed_counts(stream, window="1 day", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["key"]): (r["cnt"], r["value_sum"])
        for r in spark.sql("select * from win_counts").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.col("event_type").alias("key"),
        )
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 6).alias("vs"))
        .collect()
    )
    # windows still open at end-of-stream (beyond the watermark frontier)
    # are not emitted in append mode: every emitted window must match batch
    exp = {(r["day"], r["key"]): (r["cnt"], r["vs"]) for r in batch}
    assert got, "no windows emitted"
    for k, v in got.items():
        assert exp[k] == v


def test_sessionize_stateful(spark, tmp_path):
    stream, src = _events_stream(spark, tmp_path, "ev2")
    q = (
        sessionize(stream, gap_minutes=1)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    # one micro-batch ingests everything; then the processing-time timeout
    # fires on the NEXT batch after the gap elapses
    deadline = time.time() + 120
    rows = []
    while time.time() < deadline:
        rows = spark.sql("select * from sessions").collect()
        if rows:
            break
        time.sleep(5)
    q.stop()
    assert rows, "no sessions emitted before timeout"
    by_user = {r["user_id"]: r for r in rows}
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    )
    exp = {r["user_id"]: r for r in batch}
    for uid, r in by_user.items():
        assert r["n_events"] == exp[uid]["n"]
        assert r["session_start"] == exp[uid]["lo"]
        assert r["session_end"] == exp[uid]["hi"]
