"""North-star extensions (BASELINE.json spark_approach + task brief): dedup,
similarity search, text analysis, as-of/range joins, event windowing — the
operators a 100 TB training-data pipeline needs, over the driver's
documents / embeddings / events tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.workload import load, query
