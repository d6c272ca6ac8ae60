"""localsql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of anki-code/localsql (reference at
/root/reference), re-expressed Spark-first.

The reference is SQL-over-local-files (csv/xlsx/json) delegating execution to
SQLite via pandasql (reference: localsql/localsql.py:230).  Here the same
capability surface is a thin layer over Spark SQL: files register as temp
views, ``spark.sql`` runs directly over them, and Catalyst/Tungsten pick the
physical plan.  On top of parity, ``operators/`` adds the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
as-of/range joins, streaming windows) the reference lacks.
"""

__version__ = "0.1.0"

from localsql_spark.session import get_spark  # noqa: F401
from localsql_spark.catalog import register_directory, register_file, tablename_from_file  # noqa: F401
from localsql_spark.engine import LocalSparkSQL  # noqa: F401
