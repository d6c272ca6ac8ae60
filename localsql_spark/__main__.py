"""``python -m localsql_spark`` — CLI entry (reference: localsql/localsql shim)."""

from localsql_spark.cli import main

raise SystemExit(main())
