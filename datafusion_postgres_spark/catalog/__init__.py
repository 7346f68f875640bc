from datafusion_postgres_spark.catalog.names import (  # noqa: F401
    INFORMATION_SCHEMA_TABLES,
    PG_CATALOG_TABLES,
)
