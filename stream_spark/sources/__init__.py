from stream_spark.sources.tables import (
    TABLES,
    TEXT_TS_FMT,
    load_table,
    load_tables,
    register_views,
    stage_table_as,
)

__all__ = ["TABLES", "TEXT_TS_FMT", "load_table", "load_tables", "register_views", "stage_table_as"]
