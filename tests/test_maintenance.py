"""Small-file compaction: bounded file counts, identical data,
restored in-file sort, atomic swap."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reddit_hn_etl_spark.sources.maintenance import (
    compact_partitions,
    plan_compaction,
)


def _fragmented_table(spark, root):
    # 3 event dates × 8 tiny appends each — the streaming-ingest
    # fragmentation shape.
    for i in range(8):
        rows = [
            (d * 100 + i * 10 + k, f"2024-01-0{d}", float(i))
            for d in (1, 2, 3)
            for k in range(10)
        ]
        (
            spark.createDataFrame(rows, "id long, event_date string, v double")
            .repartition(2)
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(root)
        )


def _files_per_partition(root):
    out = {}
    for p in sorted(glob.glob(os.path.join(root, "event_date=*"))):
        out[os.path.basename(p)] = len(glob.glob(os.path.join(p, "*.parquet")))
    return out


def test_plan_compaction_counts(spark, tmp_path):
    root = str(tmp_path / "frag")
    _fragmented_table(spark, root)
    plan = {
        # hive partition values come back type-inferred (DATE here)
        str(r.event_date): (r.n_rows, r.n_files)
        for r in plan_compaction(
            spark.read.parquet(root), ["event_date"], rows_per_file=30
        ).collect()
    }
    assert plan == {f"2024-01-0{d}": (80, 3) for d in (1, 2, 3)}


def test_compact_rewrites_bounded_sorted_identical(spark, tmp_path):
    root = str(tmp_path / "frag2")
    _fragmented_table(spark, root)
    before = _files_per_partition(root)
    assert all(n >= 8 for n in before.values())  # genuinely fragmented
    data_before = sorted(
        (r.id, str(r.event_date), r.v)
        for r in spark.read.parquet(root).collect()
    )

    n = compact_partitions(
        spark, root, ["event_date"], sort_col="id", rows_per_file=30
    )
    assert n == 3
    after = _files_per_partition(root)
    assert set(after) == set(before)
    assert all(n_files <= 3 for n_files in after.values())
    data_after = sorted(
        (r.id, str(r.event_date), r.v)
        for r in spark.read.parquet(root).collect()
    )
    assert data_after == data_before  # byte-for-byte same rows
    # in-file sort restored: every file individually ordered by id
    for path in glob.glob(os.path.join(root, "event_date=*", "*.parquet")):
        ids = [r.id for r in spark.read.parquet(path).collect()]
        assert ids == sorted(ids)
    # no temp/old dirs left behind
    assert not os.path.exists(root + ".compact.tmp")
    assert not os.path.exists(root + ".compact.old")


def test_write_globally_sorted_total_order(spark, tmp_path):
    import glob
    import os

    from reddit_hn_etl_spark.sources.maintenance import write_globally_sorted

    rows = [(int(x),) for x in [(i * 7919) % 10007 for i in range(5000)]]
    df = spark.createDataFrame(rows, "k long").repartition(16)
    out = str(tmp_path / "sorted")
    write_globally_sorted(df, out, ["k"], num_files=8)

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 8
    prev_max = None
    total = 0
    for f in files:
        ks = [r.k for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks)  # sorted within file
        if ks:
            if prev_max is not None:
                assert prev_max <= ks[0]  # ordered ACROSS files
            prev_max = ks[-1]
        total += len(ks)
    assert total == 5000
