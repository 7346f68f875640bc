from datafusion_postgres_spark.sources.registry import (  # noqa: F401
    read_file,
    register_directory,
    register_testdata,
)
