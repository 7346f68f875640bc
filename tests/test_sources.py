"""Source-registration tests (datafusion-postgres-cli/src/main.rs:62-221):
CSV/JSON/Arrow/Parquet readers + directory auto-registration."""

import json
import os

import pyarrow as pa
import pyarrow.ipc
import pytest

from datafusion_postgres_spark.sources.registry import (
    read_file, register_directory,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sources")
    # CSV with header (schema inference like CsvReadOptions::default)
    (d / "climate.csv").write_text(
        "date,meantemp,humidity\n"
        "2013-01-01,10.0,84.5\n"
        "2013-01-02,7.4,92.0\n"
        "2013-01-03,7.17,87.0\n")
    # NDJSON
    with open(d / "events_x.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "kind": "k" + str(i % 2)}) + "\n")
    # Arrow IPC file
    table = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    with pa.ipc.new_file(str(d / "arr.arrow"), table.schema) as w:
        w.write_table(table)
    # Parquet
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"p": [10, 20]}), str(d / "pq.parquet"))
    # unrecognized file must be skipped
    (d / "notes.txt").write_text("ignore me")
    return str(d)


def test_csv_inference(spark, data_dir):
    df = read_file(spark, os.path.join(data_dir, "climate.csv"))
    assert df.count() == 3
    dtypes = dict(df.dtypes)
    assert dtypes["meantemp"] == "double"
    assert dtypes["date"] in ("date", "string", "timestamp")


def test_json(spark, data_dir):
    df = read_file(spark, os.path.join(data_dir, "events_x.json"))
    assert df.count() == 5
    assert set(df.columns) == {"id", "kind"}


def test_arrow_ipc(spark, data_dir):
    df = read_file(spark, os.path.join(data_dir, "arr.arrow"))
    assert [r["a"] for r in df.orderBy("a").collect()] == [1, 2, 3]


def test_parquet(spark, data_dir):
    df = read_file(spark, os.path.join(data_dir, "pq.parquet"))
    assert df.count() == 2


def test_unknown_format_raises(spark, data_dir):
    with pytest.raises(ValueError):
        read_file(spark, os.path.join(data_dir, "notes.txt"))


def test_register_directory(engine, data_dir):
    names = register_directory(engine, data_dir)
    assert names == ["arr", "climate", "events_x", "pq"]
    rows = list(engine.execute("SELECT count(*) FROM climate")[0].rows())
    assert rows[0][0] == 3
    # README demo query (README.md:110-116)
    rows = list(engine.execute(
        "SELECT max(meantemp) FROM climate")[0].rows())
    assert abs(rows[0][0] - 10.0) < 1e-9
    # registered tables appear in the catalog
    rows = list(engine.execute(
        "SELECT relname FROM pg_class WHERE relname IN ('climate', 'arr') "
        "ORDER BY 1")[0].rows())
    assert [r[0] for r in rows] == ["arr", "climate"]
