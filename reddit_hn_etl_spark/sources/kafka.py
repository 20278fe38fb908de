"""Kafka source seam for the streaming surface (SURVEY.md §2.9).

The reference ingests exclusively over HTTP (`src/extract/
hn_extract.py`); a Spark-first deployment of the same pipeline would
front it with Kafka. This module is the seam: the PARSE/CONTRACT
layer (`parse_kafka_records`, `split_dead_letters`) is plain column
logic over Kafka's fixed wire schema and is fully unit-tested on
batch DataFrames; the reader (`read_kafka_stream`) builds the
`format("kafka")` stream and is gated on the spark-sql-kafka
connector, which is an add-on JAR — absent here, so the builder
raises a clear, actionable error instead of Spark's opaque
DATA_SOURCE_NOT_FOUND.

Exactly-once story: the Kafka source tracks offsets in the query
checkpoint; composed with the idempotent freshness merge
(`streaming/ingest.stream_merge_to_staging`) the pipeline is
end-to-end exactly-once for the same reason the file source is —
replayed micro-batches converge.

Scale shape: one Kafka partition maps to one Spark input partition;
`minPartitions` fans hot topics wider; `maxOffsetsPerTrigger` is the
backpressure knob (the analogue of the file source's
``maxFilesPerTrigger``). Parsing is pure projection — no shuffle
before the first keyed operator downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

#: Kafka's fixed wire schema (what `format("kafka")` emits) — pinned
#: here so the parse layer can be tested without the connector.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

_META = ("topic", "partition", "offset")


def parse_kafka_records(
    records: DataFrame,
    value_schema: T.StructType,
    ts_col: str = "kafka_ts",
) -> DataFrame:
    """Decode Kafka wire records into typed rows.

    UTF-8 key, JSON value parsed with the EXPLICIT schema (never
    inferred — the P2/P3 contract discipline applies to streams too),
    plus per-record lineage (topic, partition, offset, broker
    timestamp). Works identically on a batch frame (tests) and a
    streaming frame (production): pure projection, no state.

    Malformed values are DETECTED, not silently nulled: Spark's
    PERMISSIVE `from_json` returns an all-NULL struct for garbage
    (indistinguishable from a legitimately-all-null record), so the
    parse goes through an internal corrupt-record column — a row is
    `_parse_ok` iff the value is non-null and the corrupt column is
    unset. Route failures with ``split_dead_letters`` BEFORE touching
    `payload.*` so the contract violation is quarantined with its
    offsets, mirroring the file-source dead-letter path in
    `streaming/ingest.py`.
    """
    corrupt = "_corrupt_kafka_value"
    assert corrupt not in value_schema.fieldNames()
    internal = T.StructType(
        list(value_schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    value_str = F.col("value").cast("string")
    payload_full = F.from_json(
        value_str, internal, {"columnNameOfCorruptRecord": corrupt}
    )
    return records.select(
        F.col("key").cast("string").alias("key_str"),
        payload_full.dropFields(corrupt).alias("payload"),
        value_str.alias("_raw_value"),
        *_META,
        F.col("timestamp").alias(ts_col),
        (
            F.col("value").isNotNull()
            & payload_full.isNotNull()
            & payload_full[corrupt].isNull()
        ).alias("_parse_ok"),
    )


def split_dead_letters(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead): good rows flattened to `payload.*` + lineage;
    dead rows keep the raw value + lineage for replay/inspection."""
    good = parsed.where(F.col("_parse_ok")).select(
        "key_str", "payload.*", *_META
    )
    dead = parsed.where(~F.col("_parse_ok")).select(
        "key_str", "_raw_value", *_META
    )
    return good, dead


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Kafka → parsed stream. Requires the spark-sql-kafka connector
    JAR (an add-on, not bundled with pyspark); without it this raises
    a RuntimeError naming the missing artifact instead of Spark's
    DATA_SOURCE_NOT_FOUND."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    try:
        raw = reader.load()
    except AnalysisException as exc:  # connector JAR absent
        if "kafka" not in str(exc).lower():
            raise
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector "
            "(org.apache.spark:spark-sql-kafka-0-10_2.13:<spark "
            "version>) on the classpath — add it via "
            "spark.jars.packages. The parse layer "
            "(parse_kafka_records) is connector-independent."
        ) from exc
    return parse_kafka_records(raw, value_schema)
