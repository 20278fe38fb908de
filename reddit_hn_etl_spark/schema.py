"""Schema contracts: the typed staging contract and raw-input schema.

Reference (SURVEY.md §1.2-1.3):
  * raw HN item fields consumed by the transform
    (`src/transform/hn_transform.py:22,67-86`);
  * the fixed 12-column staging contract
    (`sql/load/02_tmp.sql:3-16`, `src/transform/hn_transform.py:93-107`);
  * required-column validation (P2, `hn_transform.py:20-22,62-65`) and
    default materialization for missing optional columns (P3,
    `hn_transform.py:67-75`) — schema *normalization*, not inference.

Raw reads always pass an explicit StructType (never inferSchema —
determinism at 100 TB: schema inference is an extra full scan and can
flip types between batches).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw HN item as consumed by the transform (FIXTURES.md §A1).
RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("by", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("descendants", T.LongType()),
        T.StructField("kids", T.ArrayType(T.LongType())),
        T.StructField("text", T.StringType()),
    ]
)

# Typed staging contract (FIXTURES.md §A2): 12 fixed columns.
STAGING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("type", T.StringType()),
        T.StructField("by", T.StringType()),
        T.StructField("time", T.LongType(), nullable=False),
        T.StructField("time_utc", T.TimestampType(), nullable=False),
        T.StructField("title", T.StringType(), nullable=False),
        T.StructField("url", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("descendants", T.LongType()),
        T.StructField("kids_count", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("extracted_at", T.TimestampType(), nullable=False),
    ]
)

STAGING_NOT_NULL = ("id", "time", "time_utc", "title", "extracted_at")
STAGING_KEY = ("id",)


@dataclass
class SchemaContract:
    """Declared shape of an input: required columns must be present;
    missing optional columns are materialized with typed defaults."""

    required: tuple[str, ...]
    defaults: dict[str, object] = field(default_factory=dict)
    types: dict[str, T.DataType] = field(default_factory=dict)

    def normalize(self, df: DataFrame) -> DataFrame:
        """P2+P3: fail fast on missing required columns; add missing
        optional columns as typed literals (defaults)."""
        present = set(df.columns)
        missing_required = [c for c in self.required if c not in present]
        if missing_required:
            raise ValueError(
                f"missing required columns: {missing_required} "
                f"(`src/transform/hn_transform.py:62-65` semantics)"
            )
        out = df
        for col, default in self.defaults.items():
            if col not in present:
                lit = F.lit(default)
                if col in self.types:
                    lit = lit.cast(self.types[col])
                out = out.withColumn(col, lit)
        return out


# The reference's raw contract: required present (value may be null
# for `by`), optional columns defaulted (`hn_transform.py:22,67-75`).
HN_RAW_CONTRACT = SchemaContract(
    required=("id", "by", "time", "title", "type"),
    defaults={
        "url": None,
        "text": None,
        "kids": None,
        "descendants": 0,
        "score": 0,
    },
    types={
        "url": T.StringType(),
        "text": T.StringType(),
        "kids": T.ArrayType(T.LongType()),
        "descendants": T.LongType(),
        "score": T.LongType(),
    },
)
