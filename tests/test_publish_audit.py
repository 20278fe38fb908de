"""Atomic publish (D5) + audit protocol (K5) behavior tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_hn_etl_spark.audit import AuditLog
from reddit_hn_etl_spark.sources import publish


def _df(spark, n, tag):
    return spark.range(n).select(F.col("id"), F.lit(tag).alias("tag"))


def test_publish_and_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "marts")
    v1 = publish.publish_tables({"a": _df(spark, 3, "v1"), "b": _df(spark, 2, "v1")}, root)
    assert publish.current_version(root) == v1
    assert publish.read_published(spark, root, "a").count() == 3

    v2 = publish.publish_tables(
        {"a": _df(spark, 5, "v2"), "b": _df(spark, 1, "v2")}, root
    )
    assert publish.current_version(root) == v2
    df = publish.read_published(spark, root, "a")
    assert df.count() == 5 and df.select("tag").first().tag == "v2"


def test_publish_failure_leaves_pointer_untouched(spark, tmp_path):
    """All-or-nothing: a failing publish must not move _CURRENT
    (reference single-transaction semantics, src/mart/hn_mart.py:59-74)."""
    root = str(tmp_path / "marts")
    v1 = publish.publish_tables({"a": _df(spark, 3, "v1")}, root)

    bad = spark.range(1).select((F.lit(1) / F.lit(0)).alias("boom"))  # ANSI: fails
    with pytest.raises(Exception):
        publish.publish_tables({"a": bad}, root)
    assert publish.current_version(root) == v1  # live view never torn
    assert publish.read_published(spark, root, "a").count() == 3


def test_vacuum_keeps_live(spark, tmp_path):
    root = str(tmp_path / "marts")
    for i in range(4):
        publish.publish_tables({"a": _df(spark, i + 1, f"v{i}")}, root, version=f"000{i}")
    victims = publish.vacuum(root, keep=2)
    assert victims == ["0000", "0001"]
    assert publish.read_published(spark, root, "a").count() == 4


def test_audit_lifecycle(spark, tmp_path):
    log = AuditLog(spark, str(tmp_path / "audit"))
    rec = log.start_run("load", source_file="batch=x")
    state = {r.run_id: r for r in log.current_state().collect()}
    assert state[rec.run_id].status == "running"  # visible before work

    log.succeed(rec, rows_copied=100, inserted=40, updated=2)
    state = {r.run_id: r for r in log.current_state().collect()}
    row = state[rec.run_id]
    assert row.status == "success"
    assert (row.rows_copied, row.rows_merged_inserted, row.rows_merged_updated) == (
        100, 40, 2,
    )

    rec2 = log.start_run("load")
    log.fail(rec2, RuntimeError("boom"))
    state = {r.run_id: r for r in log.current_state().collect()}
    assert state[rec2.run_id].status == "failed"
    assert "boom" in state[rec2.run_id].error_message
    assert log.history().count() == 4  # append-only: every transition kept


def test_time_travel_read_version(spark, tmp_path):
    root = str(tmp_path / "tt")
    publish.publish_tables({"a": _df(spark, 3, "v1")}, root, version="0001")
    publish.publish_tables({"a": _df(spark, 5, "v2")}, root, version="0002")

    assert publish.list_versions(root) == ["0001", "0002"]
    assert publish.current_version(root) == "0002"
    # live read sees v2; time travel sees v1 unchanged
    assert publish.read_published(spark, root, "a").count() == 5
    assert publish.read_version(spark, root, "a", "0001").count() == 3

    import pytest

    with pytest.raises(FileNotFoundError, match="available"):
        publish.read_version(spark, root, "a", "9999")


def test_rollback_swaps_pointer_atomically(spark, tmp_path):
    root = str(tmp_path / "rb")
    publish.publish_tables({"a": _df(spark, 3, "good")}, root, version="0001")
    publish.publish_tables({"a": _df(spark, 7, "bad")}, root, version="0002")

    prev = publish.rollback(root, "0001")
    assert prev == "0002"
    assert publish.current_version(root) == "0001"
    assert publish.read_published(spark, root, "a").count() == 3
    # the bad version stays retained for forensics until vacuumed
    assert publish.read_version(spark, root, "a", "0002").count() == 7

    import pytest

    with pytest.raises(FileNotFoundError, match="available"):
        publish.rollback(root, "3333")


def test_vacuum_then_time_travel_fails_loudly(spark, tmp_path):
    root = str(tmp_path / "vc")
    for i in range(4):
        publish.publish_tables(
            {"a": _df(spark, i + 1, f"v{i}")}, root, version=f"000{i}"
        )
    publish.vacuum(root, keep=2)

    import pytest

    with pytest.raises(FileNotFoundError, match="not retained"):
        publish.read_version(spark, root, "a", "0000")
    assert publish.read_version(spark, root, "a", "0003").count() == 4


def test_cli_list_versions_and_rollback(spark, tmp_path, capsys):
    from reddit_hn_etl_spark.__main__ import main

    root = str(tmp_path / "cli_tt")
    publish.publish_tables({"a": _df(spark, 3, "v1")}, root, version="0001")
    publish.publish_tables({"a": _df(spark, 5, "v2")}, root, version="0002")

    assert main(["--list-versions", root]) == 0
    out = capsys.readouterr().out
    assert "v=0001" in out and "v=0002  <- live" in out

    assert main(["--rollback", root, "0001"]) == 0
    assert publish.current_version(root) == "0001"
    out = capsys.readouterr().out
    assert "0002 -> 0001" in out
