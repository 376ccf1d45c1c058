"""Source/sink seam: Iceberg when a catalog is configured, parquet otherwise.

The production target is an Iceberg table of image+caption pairs
(BASELINE.json input_hint); this sandbox has no Iceberg runtime jar, so every
reader/writer goes through this seam (SURVEY.md §7.3 risk 6) and the engine
is tested against the parquet fallback with the identical schema. The
reference's only "source" is R's lazy `.rda` loading (DESCRIPTION:17,
README.md:35,51) — scans, partition pruning and column projection have no
reference twin and come from Spark.

Conventions:
- a source string containing "." and no "/" is treated as a catalog table
  name (``spark.read.table`` / ``writeTo`` — Iceberg or any configured
  catalog); anything else is a parquet path.
- writes are atomic at the directory level (parquet _SUCCESS / Iceberg
  snapshot commit), which is what StageRunner's resume contract relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

IMAGES_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")


def is_table_name(source: str) -> bool:
    return "." in source and "/" not in source and not source.endswith(".parquet")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is on the classpath + configured."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_images(spark: SparkSession, source: str, columns: list[str] | None = None) -> DataFrame:
    """images table from a catalog table name or parquet path.

    ``columns`` prunes the scan explicitly — pass only what the tier needs
    (`bytes` stays unread for the caption tier; at 10^12 rows that is the
    difference between scanning captions and scanning the whole corpus).
    Catalyst would prune through select() anyway; the parameter makes the
    contract visible at the call site.
    """
    df = (
        spark.read.table(source)
        if is_table_name(source)
        else spark.read.parquet(source)
    )
    return df.select(*columns) if columns else df


def write_table(
    df: DataFrame, target: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Stage sink: Iceberg/catalog `writeTo` when target is a table name,
    parquet directory otherwise. ``partition_by`` maps to Iceberg partition
    spec / parquet directory partitioning (e.g. bucket the `clusters` output
    by cluster_id prefix for co-located downstream joins)."""
    if is_table_name(target):
        w = df.writeTo(target)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
