"""Table diff: classification matrix incl. NULL-safe comparison."""

from __future__ import annotations

from reddit_hn_etl_spark.operators.diff import diff_report, table_diff


def test_table_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged
            (2, "b", 2.0),      # updated: NULL → 2.0 (null-safe inequality)
            (4, None, 4.0),     # unchanged: NULL == NULL under eqNullSafe
            (5, "e", 5.0),      # inserted
        ],                       # 3 deleted
        "id long, s string, v double",
    )
    rows = {r.id: r for r in table_diff(old, new, ["id"]).collect()}
    assert rows[1].diff_status == "unchanged"
    assert rows[2].diff_status == "updated" and rows[2].chg_v and not rows[2].chg_s
    assert rows[3].diff_status == "deleted"
    assert rows[4].diff_status == "unchanged"
    assert rows[5].diff_status == "inserted"
    # inserted/deleted rows never count as column changes
    assert not rows[3].chg_v and not rows[5].chg_v

    rep = {r.metric: r.n for r in diff_report(old, new, ["id"]).collect()}
    assert rep == {
        "inserted": 1, "deleted": 1, "updated": 1, "unchanged": 2,
        "col:s": 0, "col:v": 1,
    }
