"""Scalar-function coverage (SURVEY.md §2B "Scalar functions"): string, math,
date/time, null/conditional, json — each family as one row-wise query whose
values are bit-identical across Spark and the DuckDB oracle (no aggregation,
so no float-order concerns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from localsql_spark.workload import load, query
