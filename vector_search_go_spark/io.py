"""Table loading.

Replaces the reference's HDF5 scan + dataset prep
(annbench/annbench.go:189-293, SURVEY.md section 2 O24/O25): the driver
supplies parquet, so ``spark.read.parquet`` is the whole story. Column
pruning and filter pushdown reach the parquet scan for free because every
operator stays in the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
