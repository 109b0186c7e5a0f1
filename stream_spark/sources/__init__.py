from stream_spark.sources.binary import read_binary_files, write_binary_files
from stream_spark.sources.tables import (
    TABLES,
    TEXT_TS_FMT,
    load_table,
    load_tables,
    register_views,
    stage_table_as,
    pid_scoped_table,
    write_bucketed,
)

__all__ = ["TABLES", "read_binary_files", "write_binary_files", "TEXT_TS_FMT", "load_table", "load_tables", "register_views", "stage_table_as", "write_bucketed", "pid_scoped_table"]
