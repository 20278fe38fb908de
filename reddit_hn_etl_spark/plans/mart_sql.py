"""The mart layer as Spark SQL text — the reference's native surface.

`RCepenco/reddit-hn-etl` expresses its marts as SQL scripts
(`sql/mart/02_marts.sql`); users migrating from it expect to keep
writing SQL. These statements are the Spark-SQL translations of the
three mart queries, verified equal to the DataFrame pipelines in
plans/hn_pipeline.py (tests/test_mart_sql.py) — both lower to the
same Catalyst plans, so either surface is first-class.

Usage:
    staging_df.createOrReplaceTempView("staging_hn_stories")
    spark.sql(DAILY_STORY_METRICS_SQL)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STAGING_VIEW = "staging_hn_stories"

# `sql/mart/02_marts.sql:9-46` — base CTE + daily aggregates.
DAILY_STORY_METRICS_SQL = f"""
WITH base AS (
    SELECT * FROM {STAGING_VIEW}
    WHERE type = 'story' AND time_utc IS NOT NULL
)
SELECT CAST(time_utc AS DATE)                       AS metric_date,
       CAST(COUNT(*) AS INT)                        AS stories_count,
       CAST(SUM(COALESCE(score, 0)) AS BIGINT)      AS total_score,
       CAST(AVG(COALESCE(score, 0)) AS DECIMAL(10,2))       AS avg_score,
       CAST(SUM(COALESCE(descendants, 0)) AS BIGINT)        AS total_comments,
       CAST(AVG(COALESCE(descendants, 0)) AS DECIMAL(10,2)) AS avg_comments,
       MAX(extracted_at)                            AS last_batch_extracted_at
FROM base
GROUP BY CAST(time_utc AS DATE)
"""

# `sql/mart/02_marts.sql:49-90` — domain extraction pipeline (F1-F4).
TOP_DOMAINS_DAILY_SQL = f"""
WITH base AS (
    SELECT * FROM {STAGING_VIEW}
    WHERE type = 'story' AND time_utc IS NOT NULL
)
SELECT CAST(time_utc AS DATE) AS metric_date,
       CASE WHEN url IS NULL OR url = '' THEN '(no_domain)'
            ELSE split_part(replace(replace(lower(url), 'https://', ''),
                                    'http://', ''), '/', 1)
       END                                          AS domain,
       CAST(COUNT(*) AS INT)                        AS stories_count,
       CAST(AVG(COALESCE(score, 0)) AS DECIMAL(10,2)) AS avg_score,
       MAX(extracted_at)                            AS last_batch_extracted_at
FROM base
GROUP BY 1, 2
"""

# `sql/mart/02_marts.sql:93-125` — author activity.
USER_ACTIVITY_DAILY_SQL = f"""
WITH base AS (
    SELECT * FROM {STAGING_VIEW}
    WHERE type = 'story' AND time_utc IS NOT NULL
)
SELECT CAST(time_utc AS DATE)                       AS metric_date,
       COALESCE(by, '(unknown)')                    AS author,
       CAST(COUNT(*) AS INT)                        AS stories_count,
       CAST(AVG(COALESCE(score, 0)) AS DECIMAL(10,2)) AS avg_score,
       MAX(extracted_at)                            AS last_batch_extracted_at
FROM base
GROUP BY 1, 2
"""

MART_SQL = {
    "daily_story_metrics": DAILY_STORY_METRICS_SQL,
    "top_domains_daily": TOP_DOMAINS_DAILY_SQL,
    "user_activity_daily": USER_ACTIVITY_DAILY_SQL,
}


def run_mart_sql(spark: SparkSession, staging: DataFrame) -> dict[str, DataFrame]:
    """Register the staging view and run all three mart SQL statements."""
    staging.createOrReplaceTempView(STAGING_VIEW)
    return {name: spark.sql(sql) for name, sql in MART_SQL.items()}
