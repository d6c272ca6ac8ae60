from localsql_spark.sources.readers import df_from_file, sniff_format  # noqa: F401
