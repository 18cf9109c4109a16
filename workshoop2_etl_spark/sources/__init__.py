"""Sources & sinks (reference SURVEY.md §2.1, S1-S9)."""

from workshoop2_etl_spark.sources.contracts import (
    SchemaContractError,
    require_columns,
    validate_schema,
)
from workshoop2_etl_spark.sources.readers import (
    load_tables,
    read_csv,
    read_jdbc,
    read_parquet,
    from_records,
    TESTDATA_TABLES,
)
from workshoop2_etl_spark.sources.writers import (
    write_csv,
    write_jdbc,
    write_parquet,
)

__all__ = [
    "SchemaContractError",
    "require_columns",
    "validate_schema",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "from_records",
    "load_tables",
    "TESTDATA_TABLES",
    "write_csv",
    "write_jdbc",
    "write_parquet",
]
