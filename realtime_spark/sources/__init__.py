from realtime_spark.sources.testdata import load_table, changes_from_orders  # noqa: F401
from realtime_spark.sources.wal2json import (  # noqa: F401
    WAL2JSON_SCHEMA_DDL,
    parse_wal2json,
)
