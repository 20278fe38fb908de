"""Registered Python DataSource: partition planning, determinism,
schema ownership, option parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_hn_etl_spark.sources.python_datasource import (
    HNItemsDataSource,
    _fake_item,
)


def _read(spark, **opts):
    spark.dataSource.register(HNItemsDataSource)
    r = spark.read.format("hn_items")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_range_read_is_deterministic(spark):
    df = _read(spark, ids="1000-1099", mode="fake", chunk_size="20")
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 100
    # pure function of the id: re-read identical
    again = {r.id: r for r in _read(spark, ids="1000-1099").collect()}
    assert {i: tuple(r) for i, r in rows.items()} == {
        i: tuple(r) for i, r in again.items()
    }
    # spot-check against the generator itself
    assert tuple(rows[1000]) == _fake_item(1000)


def test_partition_planning_matches_chunks(spark):
    df = _read(spark, ids="1-100", chunk_size="25")
    n_parts = (
        df.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts == 4  # 100 ids / 25 per chunk


def test_schema_and_type_semantics(spark):
    df = _read(spark, ids="1,2,3,4,5,6,7,8")
    assert df.columns == [
        "id", "type", "by", "time", "text", "url", "score", "title",
        "descendants",
    ]
    for r in df.collect():
        if r.type == "comment":
            assert r.text is not None and r.title is None
        elif r.type == "story":
            assert r.url is not None and r.text is None
