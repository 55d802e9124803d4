"""Sources & sinks (SURVEY.md §2.1, S1-S6)."""

from .readers import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_json_records,
    read_orc,
    read_parquet,
    read_parquet_evolving,
    read_table,
    read_tables,
)
from .writers import (  # noqa: F401
    compact_parquet,
    write_csv,
    write_jdbc,
    write_json,
    write_orc,
    write_parquet,
)
