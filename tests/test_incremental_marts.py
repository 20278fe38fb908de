"""Incremental mart refresh == full refresh on every touched date,
and untouched partitions survive."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reddit_hn_etl_spark.plans import hn_pipeline as hp

UTC = dt.timezone.utc


def _staging(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, type string, by string, time long, time_utc timestamp, "
        "title string, url string, score long, descendants long, "
        "kids_count long, text string, extracted_at timestamp",
    )


def _row(i, day, score):
    ts = dt.datetime(2024, 1, day, 12, 0, 0)
    return (i, "story", f"u{i % 3}", int(ts.timestamp()), ts, f"t{i}",
            None, score, 0, 0, None, dt.datetime(2024, 1, 20))


def test_incremental_equals_full(spark, tmp_path):
    base_rows = [_row(i, day, i * 10) for i, day in enumerate([1, 1, 2, 2, 3])]
    staging0 = _staging(spark, base_rows)
    root = str(tmp_path / "marts")

    # bootstrap: full build of all partitions
    hp.refresh_marts_incremental(staging0, staging0, root)
    before = {
        str(r.metric_date): r.stories_count
        for r in spark.read.parquet(f"{root}/daily_story_metrics").collect()
    }
    assert set(before) == {"2024-01-01", "2024-01-02", "2024-01-03"}

    # new batch touches only Jan 2 (new story id=10)
    batch = _staging(spark, [_row(10, 2, 99)])
    staging1 = staging0.unionByName(batch)
    dates = hp.refresh_marts_incremental(staging1, batch, root)
    assert [str(d) for d in dates] == ["2024-01-02"]

    inc = spark.read.parquet(f"{root}/daily_story_metrics")
    full = hp.mart_daily_story_metrics(staging1)
    inc_rows = {str(r.metric_date): (r.stories_count, r.total_score)
                for r in inc.collect()}
    full_rows = {str(r.metric_date): (r.stories_count, r.total_score)
                 for r in full.collect()}
    assert inc_rows == full_rows          # incremental == full refresh
    assert inc_rows["2024-01-02"][0] == 3  # rebuilt partition
    assert inc_rows["2024-01-01"] == full_rows["2024-01-01"]  # untouched survived


def test_partitioned_staging_layout(spark, tmp_path):
    staging = _staging(spark, [_row(i, (i % 3) + 1, i) for i in range(30)])
    root = str(tmp_path / "staging_part")
    hp.write_staging_partitioned(staging, root)

    got = spark.read.parquet(root)
    assert got.count() == 30
    # partition pruning: a date filter must prune to one partition dir
    pruned = got.where(F.col("event_date") == "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and pruned.count() == 10
