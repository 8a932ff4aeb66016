from pypiper_spark.sources.io import (  # noqa: F401
    read_table_any,
    write_table,
)
