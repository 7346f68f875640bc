"""datafusion_postgres_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of datafusion-contrib/datafusion-postgres.

Architecture (Spark-first, NOT a port):
  * Spark SQL / Catalyst / Tungsten play DataFusion's role — every relational
    operator (scan, filter, join, aggregate, window, sort, set ops) is
    expressed declaratively through the DataFrame/SQL API so Catalyst can
    push down predicates, prune columns, broadcast small sides, and let AQE
    re-plan at runtime.
  * Our own code is the *compatibility and serving layer* the reference
    hand-wrote on top of DataFusion (see SURVEY.md §0): Postgres dialect
    handling, session state (SET/SHOW, transactions, cursors), pg_catalog
    emulation, type/OID mapping and result encoding, plus the
    large-scale data-pipeline operators (dedup, similarity, text analysis,
    multimodal) that a 100 TB training-data pipeline needs.

Entry points:
  * ``datafusion_postgres_spark.session.SparkPgEngine`` — engine facade
    (register files, execute Postgres-dialect SQL, session features).
  * ``datafusion_postgres_spark.queries`` — the operator/query registry that
    backs ``__spark_entry__.py`` (driver correctness + bench contract).
"""

__version__ = "0.1.0"

from datafusion_postgres_spark.session import SparkPgEngine, build_spark  # noqa: F401
