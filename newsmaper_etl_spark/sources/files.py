"""Batch CSV/JSON readers with pinned schemas (S4/S5).

The reference reads its source registry with ``pd.read_csv`` (header
inference, Setup.py:59) and the keyword dictionary with ``pd.read_json``
at module import (Transform.py:11). Both become schema-pinned Spark reads
— inference is a dev convenience, never a production contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: sources.csv layout (name,website,rss — Setup.py:59, sources.csv:1).
SOURCES_CSV_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("website", StringType(), False),
        StructField("rss", StringType(), False),
    ]
)

#: references.json rows: {id, name, words: [..]} (references.json:2-9).
REFERENCES_JSON_SCHEMA = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("words", ArrayType(StringType()), False),
    ]
)


def read_sources_csv(
    spark: SparkSession, path: str, assign_ids: bool = True
) -> DataFrame:
    """Source registry from CSV. ``assign_ids`` reproduces the SERIAL
    surrogate the reference's append acquires implicitly (Setup.py:60:
    ids 1..N in file order): a row_number over the read order — valid
    because the registry is a single small file; bulk fact data would
    get content-derived or identity-column keys instead."""
    df = spark.read.csv(path, header=True, schema=SOURCES_CSV_SCHEMA)
    if assign_ids:
        w = Window.orderBy(F.monotonically_increasing_id())
        df = df.withColumn("id", F.row_number().over(w)).select(
            "id", "name", "website", "rss"
        )
    return df


def read_references_json(spark: SparkSession, path: str) -> DataFrame:
    """Keyword dictionary from a JSON array document (multiLine: the file
    is one top-level array, not JSON-lines)."""
    return spark.read.json(path, schema=REFERENCES_JSON_SCHEMA, multiLine=True)
