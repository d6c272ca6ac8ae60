from localsql_spark.functions.sqlite_compat import (  # noqa: F401
    glob,
    glob_to_regex,
    group_concat,
    register_sqlite_compat,
    total,
)
