from datafusion_postgres_spark.dialect.transpiler import PostgresTranspiler  # noqa: F401
