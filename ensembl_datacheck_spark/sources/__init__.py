"""Sources & sinks: table catalog abstraction (Iceberg-or-Parquet) and the
deterministic synthetic fixture generator."""

from ensembl_datacheck_spark.sources.io import Catalog, load_sf_tables  # noqa: F401
