import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from datafusion_postgres_spark.session import build_spark
    from datafusion_postgres_spark.functions import register_all

    spark = build_spark(app_name="tests", master="local[8]",
                        extra_conf={"spark.sql.shuffle.partitions": "8"})
    register_all(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from datafusion_postgres_spark.session import SparkPgEngine

    eng = SparkPgEngine(spark)
    eng.register_file("nation", f"{SF_DIR}/nation.parquet")
    eng.register_file("region", f"{SF_DIR}/region.parquet")
    eng.register_file("orders", f"{SF_DIR}/orders.parquet")
    return eng


@pytest.fixture(scope="session")
def tables(spark):
    from datafusion_postgres_spark.sources.registry import register_testdata

    return register_testdata(spark, SF_DIR)
