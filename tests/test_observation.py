"""Observation API: pipeline metrics piggyback on the action that
already runs — no second scan for row counts / quality tallies (the
production alternative to count()-after-write, which re-reads).
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observation_metrics_ride_the_write(spark, tmp_path):
    obs = Observation("ingest_metrics")
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("k"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") * 2).alias(
            "v"
        ),
    )
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null_v"),
        F.sum("v").alias("sum_v"),
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))

    got = obs.get
    assert got["n_rows"] == 1000
    assert got["n_null_v"] == 143  # ids 0,7,...,994
    expect_sum = sum(i * 2 for i in range(1000) if i % 7 != 0)
    assert got["sum_v"] == expect_sum


def test_observation_on_streaming_foreach_batch(spark, tmp_path):
    """The same pattern per micro-batch: observe inside foreachBatch
    gives per-batch metrics without a second pass over the batch."""
    import json

    src = tmp_path / "obs_stream"
    src.mkdir()
    with open(src / "b1.jsonl", "w", encoding="utf-8") as f:
        for i in range(50):
            f.write(json.dumps({"id": i, "v": float(i)}) + "\n")

    stream = spark.readStream.schema("id long, v double").json(str(src))
    seen = []

    def sink(batch_df, batch_id):
        obs = Observation(f"batch_{batch_id}")
        out = batch_df.observe(obs, F.count(F.lit(1)).alias("n"))
        out.write.mode("append").parquet(str(tmp_path / "obs_out"))
        seen.append(obs.get["n"])

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(seen) == 50
