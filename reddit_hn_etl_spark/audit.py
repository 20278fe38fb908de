"""Run-audit protocol (K5): every pipeline run leaves a manifest row.

Reference contract (`sql/load/01_audit.sql:3-14`,
`src/load/hn_load.py:62-71,109-120,138-161`):
  * a ``running`` row is committed BEFORE the work transaction (so a
    crashed run is visible as running/failed, never silent);
  * on success the row gains finished_at + row metrics
    (rows_copied, rows_merged_inserted, rows_merged_updated);
  * on failure it records status=failed + error_message.

Spark re-expression: an append-only parquet manifest — each state
transition appends a new immutable record; the *latest record per
run_id* is the run's state (last-writer-wins view below). Append-only
beats update-in-place on object stores and keeps full history.

``now()`` appears here and only here (F8): audit timestamps are
wall-clock by design; the data path stays deterministic
(`src/common/files.py:9-13`).
"""

from __future__ import annotations

import datetime as dt
import uuid
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUSES = ("running", "success", "failed")

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("phase", T.StringType(), False),
        T.StructField("source_file", T.StringType()),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_copied", T.LongType()),
        T.StructField("rows_merged_inserted", T.LongType()),
        T.StructField("rows_merged_updated", T.LongType()),
        T.StructField("error_message", T.StringType()),
    ]
)


def latest_state(raw: DataFrame) -> DataFrame:
    """Last-writer-wins resolution over an append-only manifest: the
    newest finished record per run_id wins; an unfinished ``running``
    row only surfaces while no terminal row exists. Status is the
    deterministic tie-break (success > running > failed lexically
    DESC) for same-timestamp records."""
    w = Window.partitionBy("run_id").orderBy(
        F.desc_nulls_last("finished_at"), F.desc("status")
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


@dataclass
class AuditRecord:
    run_id: str
    phase: str
    source_file: str | None
    started_at: dt.datetime
    finished_at: dt.datetime | None
    status: str
    rows_copied: int | None = None
    rows_merged_inserted: int | None = None
    rows_merged_updated: int | None = None
    error_message: str | None = None


class AuditLog:
    """Append-only audit manifest over a parquet directory.

    Every state transition is also logged through the shared
    operational logger (reference `src/common/logging_utils.py:7-33`
    wired through every phase) — logs are the first debugging stop,
    the audit table the durable record.
    """

    def __init__(self, spark: SparkSession, path: str):
        from .logging_utils import get_logger

        self.spark = spark
        self.path = path
        self.log = get_logger("reddit_hn_etl_spark.audit", "pipeline.log")

    def _append(self, rec: AuditRecord) -> None:
        df = self.spark.createDataFrame([asdict(rec)], schema=AUDIT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def start_run(self, phase: str, source_file: str | None = None) -> AuditRecord:
        """Commit a ``running`` row before any work
        (`src/load/hn_load.py:62-71`)."""
        rec = AuditRecord(
            run_id=str(uuid.uuid4()),
            phase=phase,
            source_file=source_file,
            started_at=dt.datetime.now(dt.timezone.utc),
            finished_at=None,
            status="running",
        )
        self._append(rec)
        self.log.info(
            "phase=%s run_id=%s status=running source=%s",
            phase, rec.run_id, source_file,
        )
        return rec

    def succeed(
        self,
        rec: AuditRecord,
        rows_copied: int,
        inserted: int,
        updated: int,
    ) -> AuditRecord:
        done = AuditRecord(
            **{
                **asdict(rec),
                "finished_at": dt.datetime.now(dt.timezone.utc),
                "status": "success",
                "rows_copied": rows_copied,
                "rows_merged_inserted": inserted,
                "rows_merged_updated": updated,
            }
        )
        self._append(done)
        self.log.info(
            "phase=%s run_id=%s status=success rows=%d inserted=%d updated=%d",
            rec.phase, rec.run_id, rows_copied, inserted, updated,
        )
        return done

    def fail(self, rec: AuditRecord, error: Exception | str) -> AuditRecord:
        done = AuditRecord(
            **{
                **asdict(rec),
                "finished_at": dt.datetime.now(dt.timezone.utc),
                "status": "failed",
                "error_message": str(error)[:2000],
            }
        )
        self._append(done)
        self.log.error(
            "phase=%s run_id=%s status=failed error=%s",
            rec.phase, rec.run_id, str(error)[:500],
        )
        return done

    def current_state(self) -> DataFrame:
        """Latest record per run_id (the mutable-table view of the
        append-only log)."""
        raw = self.spark.read.schema(AUDIT_SCHEMA).parquet(self.path)
        return latest_state(raw)

    def history(self) -> DataFrame:
        return self.spark.read.schema(AUDIT_SCHEMA).parquet(self.path)
