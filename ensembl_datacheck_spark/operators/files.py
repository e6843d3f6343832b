"""Filesystem ↔ table reconciliation (SURVEY.md S26).

Reference: DataFilesExist.pm:125-165 checks every `data_file` row against
the filesystem (and 167-184 the reverse).  Spark-first restatement: build
a listing DataFrame (Hadoop FS API executor-side for object stores;
driver-side os.walk suffices for local paths and keeps the anti-join
distributed) and anti-join both directions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LISTING_SCHEMA = "path string, size long, mtime_ns long"


def listing_df(spark: SparkSession, root: str) -> DataFrame:
    """Listing DataFrame of all files under ``root``.  For hdfs/s3 roots
    this would enumerate via the Hadoop FileSystem API (executor-side
    parallel listing per prefix); local paths walk on the driver — the
    listing is metadata-sized either way."""
    if not os.path.isdir(root):
        # fail fast: os.walk of a nonexistent/unreadable/object-store
        # root silently yields NOTHING, and an empty listing makes
        # missing_files flag EVERY registered file — mass false
        # positives dressed up as a clean run.  s3://... roots need the
        # Hadoop FS enumeration described above, not this local walk.
        raise FileNotFoundError(
            f"listing root {root!r} is not a local directory "
            "(for hdfs/s3 roots enumerate via the Hadoop FileSystem API)"
        )

    def _walk_error(err: OSError) -> None:
        # a permission-denied subdirectory would otherwise silently
        # truncate the listing — same false-positive trap as a bad root
        raise err

    rows = []
    for dirpath, _dirs, files in os.walk(root, onerror=_walk_error):
        for name in files:
            p = os.path.join(dirpath, name)
            try:
                st = os.stat(p)
            except OSError:
                # dangling symlink or file deleted between walk and stat:
                # one bad entry must not abort the whole reconciliation
                continue
            rows.append((os.path.relpath(p, root), st.st_size, st.st_mtime_ns))
    return spark.createDataFrame(rows or [], LISTING_SCHEMA)


def missing_files(
    table: DataFrame, path_col: str, listing: DataFrame
) -> DataFrame:
    """Table rows whose file does not exist on disk
    (DataFilesExist.pm:136-160)."""
    return table.join(
        F.broadcast(listing.select(F.col("path").alias(path_col))),
        path_col,
        "left_anti",
    )


def unregistered_files(
    table: DataFrame, path_col: str, listing: DataFrame
) -> DataFrame:
    """Files on disk not registered in the table (the reverse check,
    DataFilesExist.pm:167-184)."""
    return listing.join(
        F.broadcast(table.select(F.col(path_col).alias("path")).distinct()),
        "path",
        "left_anti",
    )
