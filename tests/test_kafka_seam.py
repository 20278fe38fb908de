"""Kafka source seam: the parse/contract layer is tested on batch
DataFrames carrying Kafka's exact wire schema (the connector JAR is
an add-on and absent here); the reader's gate is tested to fail
loudly, not opaquely."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import types as T

from reddit_hn_etl_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_records,
    read_kafka_stream,
    split_dead_letters,
)

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("score", T.IntegerType()),
    ]
)

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _wire(spark, rows):
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def _rec(key, value, offset, partition=0, topic="hn-items"):
    return (
        key.encode() if key is not None else None,
        value.encode() if value is not None else None,
        topic,
        partition,
        offset,
        TS,
        0,
    )


def test_parse_well_formed_records(spark):
    payloads = [
        {"id": 1, "type": "story", "score": 10},
        {"id": 2, "type": "comment", "score": None},
    ]
    df = _wire(
        spark,
        [_rec(str(p["id"]), json.dumps(p), i) for i, p in enumerate(payloads)],
    )
    parsed = parse_kafka_records(df, VALUE_SCHEMA)
    good, dead = split_dead_letters(parsed)
    assert dead.count() == 0
    rows = {r.id: r for r in good.collect()}
    assert rows[1].type == "story" and rows[1].score == 10
    assert rows[2].score is None  # missing field -> typed NULL, not error
    assert rows[1].key_str == "1"
    # Lineage survives the flatten.
    assert rows[1].topic == "hn-items" and rows[1].offset == 0


def test_malformed_values_are_dead_lettered_with_lineage(spark):
    df = _wire(
        spark,
        [
            _rec("1", json.dumps({"id": 1, "type": "story", "score": 5}), 0),
            _rec("2", "{not json", 1),
            _rec("3", None, 2),  # tombstone: null value
        ],
    )
    good, dead = split_dead_letters(parse_kafka_records(df, VALUE_SCHEMA))
    assert [r.id for r in good.collect()] == [1]
    dead_rows = {r.offset: r for r in dead.collect()}
    assert set(dead_rows) == {1, 2}
    assert dead_rows[1]._raw_value == "{not json"
    assert dead_rows[2]._raw_value is None  # tombstones quarantined too


def test_parse_is_streaming_safe(spark, tmp_path):
    """The parse layer must be a pure projection — attachable to a
    readStream frame without analysis errors (no state, no
    aggregation). Run one micro-batch through a file-backed stream
    mimicking the wire schema (minus Kafka's binary transport)."""
    src = tmp_path / "wire"
    src.mkdir()
    df = _wire(
        spark, [_rec("1", json.dumps({"id": 1, "type": "story", "score": 5}), 0)]
    )
    df.write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    parsed = parse_kafka_records(stream, VALUE_SCHEMA)
    good, _dead = split_dead_letters(parsed)
    q = (
        good.writeStream.format("memory")
        .queryName("kafka_seam_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from kafka_seam_probe").collect()
    assert len(out) == 1 and out[0].id == 1


def test_reader_gate_names_the_missing_connector(spark):
    """Without the spark-sql-kafka JAR the builder must raise an
    actionable RuntimeError (if a future environment bundles the
    connector, the gate is moot — skip)."""
    try:
        read_kafka_stream(
            spark, "localhost:9092", "topic", VALUE_SCHEMA
        )
    except RuntimeError as exc:
        assert "spark-sql-kafka" in str(exc)
    except Exception:  # pragma: no cover - unexpected error type
        raise
    else:  # pragma: no cover - connector present
        pytest.skip("kafka connector available in this environment")
