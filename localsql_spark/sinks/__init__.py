from localsql_spark.sinks.writers import export_result  # noqa: F401
