"""SQL mart surface == DataFrame mart surface, row for row."""

from __future__ import annotations

import datetime as dt

from reddit_hn_etl_spark.plans import hn_pipeline as hp
from reddit_hn_etl_spark.plans.mart_sql import run_mart_sql


def _staging(spark):
    rows = []
    for i in range(40):
        ts = dt.datetime(2024, 1, 1 + i % 5, 8 + i % 12)
        rows.append((
            i, "story" if i % 7 else "job", f"u{i % 4}" if i % 5 else None,
            int(ts.timestamp()), ts, f"t{i}",
            None if i % 6 == 0 else ("" if i % 6 == 1 else f"https://S{i % 3}.Example.org/p/{i}"),
            i * 3 if i % 4 else None, i % 9, i % 5, None,
            dt.datetime(2024, 1, 10),
        ))
    return spark.createDataFrame(
        rows,
        "id long, type string, by string, time long, time_utc timestamp, "
        "title string, url string, score long, descendants long, "
        "kids_count long, text string, extracted_at timestamp",
    )


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_marts_equal_dataframe_marts(spark):
    staging = _staging(spark)
    sql_marts = run_mart_sql(spark, staging)
    df_marts = hp.build_marts(staging)
    assert set(sql_marts) == set(df_marts)
    for name in df_marts:
        assert _rowset(sql_marts[name]) == _rowset(df_marts[name]), name
