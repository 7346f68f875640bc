"""CLI: serve data files over the Postgres wire protocol.

Reference parity: ``datafusion-postgres-cli`` ("SimpleHTTPServer for data
files", ``datafusion-postgres-cli/src/main.rs:126-221``).

    python -m datafusion_postgres_spark --directory /data --port 5432
    python -m datafusion_postgres_spark --csv climate=/data/climate.csv \
        --parquet sales=/data/sales.parquet
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(
        prog="datafusion-postgres-spark",
        description="Serve CSV/JSON/Parquet/Arrow/Avro files as SQL tables "
                    "over the PostgreSQL wire protocol, on Spark.")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("-p", "--port", type=int, default=5432)
    ap.add_argument("-d", "--directory",
                    help="register every recognized file in this directory")
    for fmt in ("csv", "json", "parquet", "arrow", "avro"):
        ap.add_argument(f"--{fmt}", action="append", default=[],
                        metavar="NAME=PATH",
                        help=f"register a {fmt} file as table NAME")
    ap.add_argument("--master", default=None,
                    help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    args = ap.parse_args()

    from datafusion_postgres_spark.session import SparkPgEngine, build_spark
    from datafusion_postgres_spark.server.pgwire import PgWireServer

    spark = build_spark(master=args.master)
    # register into the root session so every connection's newSession
    # inherits nothing — registration happens via a shared bootstrap engine
    bootstrap = SparkPgEngine(spark)
    registered = []
    if args.directory:
        registered += bootstrap.register_directory(args.directory)
    for fmt in ("csv", "json", "parquet", "arrow", "avro"):
        for spec in getattr(args, fmt):
            name, _, path = spec.partition("=")
            if not path:
                ap.error(f"--{fmt} expects NAME=PATH, got {spec!r}")
            bootstrap.register_file(name, path, fmt)
            registered.append(name)

    # global temp views are visible across newSession()s; re-register the
    # tables there so per-connection engines see them
    for name in registered:
        spark.table(name).createOrReplaceGlobalTempView(name)

    class _SharedEngineServer(PgWireServer):
        pass

    server = PgWireServer(spark, host=args.host, port=args.port)

    # per-connection engines resolve global temp views through the
    # global_temp database; also mirror them as session views at connect
    orig_factory = server._server.engine_factory

    def factory():
        eng = orig_factory()
        for name in registered:
            eng.spark.table(f"global_temp.{name}").createOrReplaceTempView(name)
        eng._catalog_dirty = True
        return eng

    server._server.engine_factory = factory

    print(f"serving {len(registered)} table(s) "
          f"({', '.join(registered) or 'none'}) "
          f"on postgresql://{server.host}:{server.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
