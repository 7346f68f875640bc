"""Engine session facade.

Reference parity: the serving layer of datafusion-postgres —
``datafusion-postgres/src/lib.rs:87-195`` (server setup + SessionContext),
``datafusion-postgres-cli/src/main.rs:126-221`` (file registration),
``datafusion-postgres/src/handlers.rs:154-233`` (simple-query lifecycle).

Spark-first design: one shared ``SparkSession`` per process; each client
connection gets ``spark.newSession()`` (isolated temp views + conf, shared
cached data / executors) — this improves on the reference, which mutates a
single shared SessionContext for TimeZone (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_BUILD_LOCK = threading.Lock()

# Tuned for local[32] testing but expressed the way a real cluster deployment
# would be: AQE owns runtime partition sizing (coalesce + skew splitting),
# so the static shuffle-partition number is a ceiling, not a schedule.
DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # timestamp[ns] parquet (events.ts) is unreadable natively; read the
    # raw int64 and convert explicitly (see sources.registry.read_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
    # The pgjdbc `_pg_expandarray` lock-step rewrite (dialect/rules.py
    # rewrite_pg_expandarray) emits lateral column-alias references that may
    # precede the generator defining them; pin the conf that makes those
    # resolve rather than inheriting a deployment default.
    "spark.sql.lateralColumnAlias.enableImplicitResolution": "true",
}


def default_shuffle_partitions(cpus: str) -> str:
    """Shuffle-partition CEILING derived from the advertised core count
    (round-10, guide §2.2) instead of a constant tuned for local[32].
    AQE still coalesces small partitions at runtime, so this only sets
    the upper bound on post-shuffle parallelism. Floor of 32 keeps
    low-core bench runs (the driver's scaling measurement) on the exact
    partitioning used since r01; a 128-core deployment gets 128 instead
    of silently under-parallelizing to 32."""
    try:
        n_cores = int(cpus)
    except ValueError:
        n_cores = 32
    return str(max(32, n_cores))


def default_max_partition_bytes(cpus: str) -> str:
    """Scan-split size derived from the advertised core count (round-11,
    guide §6) instead of a constant tuned for the local bench. At the
    local bench profile (<= 32 cores) the test-scale parquet is a few
    small files and 16m splits recover scan parallelism — the exact
    value every BENCH_r01..r11 ran with, so the derivation is
    value-identical at every historical bench point by construction.
    Above 32 cores the deployment is a real cluster: 16m splits over a
    100 TB table schedule ~6M scan tasks (a driver/scheduler killer —
    guide §6 recommends 128m-1g for large sequential scans), so the
    Spark default 128m applies instead. extra_conf overrides win as
    always."""
    try:
        n_cores = int(cpus)
    except ValueError:
        n_cores = 32
    return "16m" if n_cores <= 32 else "128m"


def build_spark(app_name: str = "datafusion-postgres-spark",
                master: str | None = None,
                extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the process-wide SparkSession with engine defaults."""
    with _BUILD_LOCK:
        builder = SparkSession.builder.appName(app_name)
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        builder = builder.master(master or f"local[{cpus}]")
        conf = dict(DEFAULT_CONF)
        conf.setdefault("spark.sql.shuffle.partitions",
                        default_shuffle_partitions(cpus))
        conf.setdefault("spark.sql.files.maxPartitionBytes",
                        default_max_partition_bytes(cpus))
        if extra_conf:
            conf.update(extra_conf)
        for k, v in conf.items():
            builder = builder.config(k, v)
        return builder.getOrCreate()


@dataclass
class ExecutionResult:
    """Streamed query result — the Spark analog of the reference's
    ``encode_dataframe`` RecordBatch stream (arrow-pg/src/datatypes/df.rs:24-52).

    Rows are exposed through ``toLocalIterator`` so a 100 TB result set
    streams through the driver instead of being collect()ed.
    """

    df: DataFrame | None
    command_tag: str = "SELECT"
    rows_affected: int | None = None

    @property
    def schema(self):
        return self.df.schema if self.df is not None else None

    def rows(self) -> Iterator:
        if self.df is None:
            return iter(())
        return self.df.toLocalIterator()

    def collect(self, timeout_secs: float = 0.0) -> list:
        """Materialize under the statement timeout (57014 on deadline)."""
        if self.df is None:
            return []
        if timeout_secs > 0:
            from datafusion_postgres_spark.server.timeout import run_with_timeout
            return run_with_timeout(self.df.sparkSession, self.df.collect,
                                    timeout_secs)
        return self.df.collect()


@dataclass
class SparkPgEngine:
    """One engine instance == one client session.

    Mirrors the per-connection state of the reference
    (``datafusion-postgres/src/client.rs:4-52``): session vars, transaction
    state, cursors — but executes through Spark SQL after the Postgres →
    Spark dialect transpile.
    """

    spark: SparkSession
    session_vars: dict[str, str] = field(default_factory=dict)
    user: str = "postgres"

    # Wired lazily to avoid import cycles.
    def __post_init__(self):
        from datafusion_postgres_spark.dialect.transpiler import PostgresTranspiler
        from datafusion_postgres_spark.server.auth import AuthManager
        from datafusion_postgres_spark.server.session_state import SessionState
        from datafusion_postgres_spark.server.hooks import HookChain

        self.transpiler = PostgresTranspiler()
        self.state = SessionState()
        self.hooks = HookChain(self)
        self.auth = AuthManager()
        from datafusion_postgres_spark.functions import register_all
        register_all(self.spark)

    # -- file registration (main.rs:126-221 analog) ------------------------
    def register_file(self, name: str, path: str, fmt: str | None = None,
                      **options) -> None:
        from datafusion_postgres_spark.sources.registry import read_file
        df = read_file(self.spark, path, fmt, **options)
        df.createOrReplaceTempView(name)
        self._catalog_dirty = True

    def register_directory(self, path: str) -> list[str]:
        from datafusion_postgres_spark.sources.registry import register_directory
        return register_directory(self, path)

    # -- query execution ---------------------------------------------------
    def execute(self, sql: str) -> list[ExecutionResult]:
        """Execute a (possibly multi-statement) Postgres-dialect SQL string.

        Lifecycle mirrors handlers.rs:154-233: split → transpile →
        hook chain (cursor / SET / SHOW / txn may answer fully) → Spark SQL.
        """
        results = []
        for stmt in self.transpiler.split_statements(sql):
            results.append(self._execute_one(stmt))
        return results

    _EXPLAIN_ANALYZE_RE = None

    def _maybe_explain_analyze(self, stmt: str):
        """Real ``EXPLAIN ANALYZE``: PG executes the statement and reports
        actual rows + timings; Spark's EXPLAIN never executes. For
        row-returning statements we run the inner query (full execution),
        then emit the formatted plan PLUS PG-style ``Planning Time`` /
        ``Execution Time`` / ``Actual Rows`` trailer lines, one QUERY
        PLAN row per line (PG's row-per-line shape). Per-operator actual
        rows stay a documented capability gate (Spark surfaces node
        metrics only through the UI event log). DML under ANALYZE falls
        through to the plain EXPLAIN path (we don't execute side effects
        twice)."""
        import re
        import time
        cls = type(self)
        if cls._EXPLAIN_ANALYZE_RE is None:
            cls._EXPLAIN_ANALYZE_RE = re.compile(
                r"(?is)^\s*EXPLAIN\s+(?:\(\s*([^)]*?)\s*\)|ANALYZE\b"
                r"(?:\s+VERBOSE\b)?)\s*(.*)$")
        m = cls._EXPLAIN_ANALYZE_RE.match(stmt)
        if not m:
            return None
        opts = m.group(1)
        if opts is not None and not re.search(r"(?i)\bANALYZE\b(?!\s*\bfalse\b|\s+off\b)", opts):
            return None
        inner = m.group(2).strip().rstrip(";")
        if not inner or self.transpiler.statement_kind(inner) not in (
                "SELECT", "WITH", "VALUES", "TABLE"):
            return None
        t0 = time.perf_counter()
        df = self.spark.sql(self.transpiler.transpile(inner))
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        t1 = time.perf_counter()
        # Full execution through THIS DataFrame's QueryExecution (like
        # PG, which runs the statement and discards the tuples) so the
        # executed plan carries populated SQLMetrics — the per-operator
        # actuals DataFusion prints from its metrics tree. Streamed via
        # toLocalIterator and discarded: the driver holds one partition
        # at a time, so a large-result statement can't OOM it the way a
        # collect() would (PG's ANALYZE never materializes either).
        n = sum(1 for _ in df.toLocalIterator())
        t2 = time.perf_counter()
        lines = plan.rstrip("\n").split("\n")
        from datafusion_postgres_spark.plans.inspect import executed_nodes
        actuals = []
        for node in executed_nodes(df):
            ms = node["metrics"]
            mt = node.get("metric_types", {})
            parts = []
            if "numOutputRows" in ms:
                parts.append(f"actual rows={ms['numOutputRows']}")
            if "shuffleRecordsWritten" in ms:
                parts.append(
                    f"shuffle records={ms['shuffleRecordsWritten']}")
            # per-operator elapsed (DataFusion prints these): timing
            # metrics are ms, nsTiming ns; zeros omitted
            for key, val in ms.items():
                t = mt.get(key)
                if t not in ("timing", "nsTiming") or val <= 0:
                    continue
                if t == "nsTiming":
                    parts.append(f"{key}={val / 1e6:.3f} ms")
                else:
                    parts.append(f"{key}={val} ms")
            if parts:
                actuals.append(f"  {node['node']}: {', '.join(parts)}")
        if actuals:
            lines += ["Per-Operator Actuals:"] + actuals
        lines += [f"Planning Time: {(t1 - t0) * 1000:.3f} ms",
                  f"Execution Time: {(t2 - t1) * 1000:.3f} ms",
                  f"Actual Rows: {n}"]
        from pyspark.sql.types import StringType, StructField, StructType
        out = self.spark.createDataFrame(
            [(line,) for line in lines],
            StructType([StructField("QUERY PLAN", StringType())]))
        return ExecutionResult(df=out, command_tag="EXPLAIN")

    def _execute_one(self, stmt: str) -> ExecutionResult:
        hooked = self.hooks.try_handle(stmt)
        if hooked is not None:
            return hooked
        if self.state.in_failed_transaction():
            raise FailedTransactionError(
                "current transaction is aborted, commands ignored until "
                "end of transaction block")  # error code 25P01
        stmt, pending_tvfs = self._maybe_rewrite_pipeline_tvfs(stmt)
        self._check_permissions(
            stmt, tvf_views={view for view, _, _ in pending_tvfs})
        if pending_tvfs:
            # Materialize TVF views only now — after BOTH the per-source
            # check inside the rewrite and the statement-kind permission
            # check above. Eager builders (trained_quality runs a full
            # training job) must not execute for a denied statement.
            from datafusion_postgres_spark.functions.pipeline_tvf import (
                materialize_pipeline_tvfs,
            )
            materialize_pipeline_tvfs(self.spark, pending_tvfs)
        self._maybe_refresh_catalog(stmt)
        analyzed = self._maybe_explain_analyze(stmt)
        if analyzed is not None:
            return analyzed
        spark_sql = self.transpiler.transpile(stmt)
        kind = self.transpiler.statement_kind(stmt)
        try:
            df = self.spark.sql(spark_sql)
            if kind in ("CREATE", "DROP", "ALTER", "INSERT", "UPDATE",
                        "DELETE", "TRUNCATE", "MERGE"):
                self._catalog_dirty = True
        except Exception:
            self.state.statement_failed()
            raise
        if kind in ("INSERT", "UPDATE", "DELETE", "MERGE"):
            # DML returns no rows; surface the affected count in the tag
            # like the reference ("INSERT 0 n", handlers.rs:354-376)
            n = _dml_row_count(df)
            tag = f"{kind} {n}" if kind != "INSERT" else f"INSERT 0 {n}"
            return ExecutionResult(df=None, command_tag=tag, rows_affected=n)
        if kind == "COMMENT":
            # Spark applies COMMENT ON TABLE natively; only the tag differs
            return ExecutionResult(df=None, command_tag="COMMENT")
        if kind == "EXPLAIN" and df.columns == ["plan"]:
            # PG clients expect the QUERY PLAN column name
            df = df.withColumnRenamed("plan", "QUERY PLAN")
            return ExecutionResult(df=df, command_tag="EXPLAIN")
        if kind in ("CREATE", "DROP", "ALTER", "TRUNCATE"):
            import re as _re
            m = _re.match(
                r"(?is)^\s*(?:CREATE|DROP|ALTER)\s+(?:OR\s+REPLACE\s+)?"
                r"(?:TEMP(?:ORARY)?\s+)?(?:MATERIALIZED\s+)?"
                r"(SCHEMA|VIEW|DATABASE|SEQUENCE|FUNCTION|TYPE)\b", stmt)
            obj = m.group(1).upper() if m else "TABLE"
            return ExecutionResult(df=None, command_tag=f"{kind} {obj}")
        return ExecutionResult(df=df)

    def copy_into(self, table: str, columns: list[str] | None, data: bytes,
                  fmt: str = "text", delimiter: str | None = None,
                  null_marker: str | None = None,
                  header: bool = False) -> int:
        """COPY FROM STDIN ingestion: parse the accumulated CopyData
        payload and append to ``table`` through the normal INSERT path
        (so Spark's own analysis enforces types and table writability).

        Columns not named in the column list are filled with NULL, and the
        text fields are cast to the target column types — both per the
        public PostgreSQL COPY semantics."""
        from pyspark.sql import functions as F, types as T
        from datafusion_postgres_spark.server.copy_data import (
            CopyDataError, parse_copy_binary, parse_copy_payload)

        target = self.spark.table(table)
        tgt_fields = target.schema.fields
        if columns:
            by_lower = {f.name.lower(): f for f in tgt_fields}
            try:
                fields = [by_lower[c.lower()] for c in columns]
            except KeyError as e:
                raise CopyDataError(
                    f'column {e.args[0]} of relation "{table}" does not '
                    "exist") from None
        else:
            fields = list(tgt_fields)
        if fmt == "binary":
            # typed rows straight from the wire decoders — no string stage
            rows = parse_copy_binary(data, [f.dataType for f in fields])
            staged = self.spark.createDataFrame(
                rows, T.StructType(
                    [T.StructField(f.name, f.dataType) for f in fields]))
        else:
            rows = parse_copy_payload(data, len(fields), fmt, delimiter,
                                      null_marker, header)
            str_schema = T.StructType(
                [T.StructField(f.name, T.StringType()) for f in fields])
            staged = self.spark.createDataFrame(rows, str_schema)
        named = {f.name for f in fields}
        proj = [(F.col(f.name).cast(f.dataType) if f.name in named
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in tgt_fields]
        view = "__copy_in_buffer__"
        staged.select(*proj).createOrReplaceTempView(view)
        try:
            res = self.spark.sql(
                f"INSERT INTO {table} SELECT * FROM {view}")
        finally:
            self.spark.catalog.dropTempView(view)
        self._catalog_dirty = True
        n = _dml_row_count(res)
        return n if n else len(rows)

    def _maybe_rewrite_pipeline_tvfs(
            self, stmt: str) -> tuple[str, list]:
        """Expose the pipeline operator tier (dedup/similarity/text)
        through SQL: `SELECT * FROM minhash_near_dups('documents', 0.5)`
        — each registered pipeline-function call materializes as a lazy
        temp view and the statement proceeds through the ordinary
        transpile path, so the full relational surface composes over the
        operator output (functions/pipeline_tvf.py)."""
        kind = self.transpiler.statement_kind(stmt)
        if kind not in ("SELECT", "WITH", "CREATE", "EXPLAIN"):
            return stmt, []
        from datafusion_postgres_spark.functions.pipeline_tvf import (
            rewrite_pipeline_tvfs,
        )
        from datafusion_postgres_spark.server.auth import Resource

        def check_table(name: str) -> None:
            self.auth.check_statement(
                self.user, "SELECT",
                Resource("table",
                         name if "." in name else f"public.{name}"))

        rewritten, pending = rewrite_pipeline_tvfs(
            self.spark, stmt, check_table=check_table, defer=True)
        return (stmt, []) if rewritten is None else (rewritten, pending)

    def _check_permissions(self, stmt: str,
                           tvf_views: set[str] | None = None) -> None:
        """Per-statement RBAC (hooks/permissions.rs:44-92): map statement
        kind to a required permission and check it against every referenced
        table. Superuser (the default 'postgres' user) bypasses.

        Fail-closed rule: statement kinds that MUST reference a table
        (DML/DDL) but where the tokenizer could not extract one are denied
        for non-superusers instead of being checked against a placeholder
        — a permissive default there would let exotic spellings bypass
        grants. Table-less SELECTs (``SELECT 1``) stay allowed."""
        from datafusion_postgres_spark.server.auth import (
            PermissionDenied, Resource)

        kind = self.transpiler.statement_kind(stmt)
        tables = self.transpiler.table_names(stmt)
        if not tables:
            needs_table = kind.upper() in (
                "INSERT", "UPDATE", "DELETE", "MERGE", "CREATE", "DROP",
                "ALTER", "TRUNCATE", "GRANT", "REVOKE")
            if needs_table:
                user = self.auth.users.get(self.user)
                if user is None or not user.superuser:
                    raise PermissionDenied(
                        f"permission denied for user {self.user}: cannot "
                        f"resolve target table of {kind.upper()} statement")
            return
        for tbl in tables:
            # Engine-synthesized pipeline TVF views OF THIS STATEMENT:
            # already authorized per SOURCE table via the rewrite's
            # check_table hook; no user grant can name a one-off
            # __tvf_<sha> view, so checking it would deny the feature to
            # every table-granted user. Exempting by EXACT pending-view
            # name (never by prefix): a user-created table that merely
            # starts with __tvf_ stays fully RBAC-checked — a prefix
            # trust would be a fail-open hole for DDL/DML on such names.
            if tvf_views and tbl.split(".")[-1] in tvf_views:
                continue
            name = tbl if "." in tbl else f"public.{tbl}"
            self.auth.check_statement(self.user, kind,
                                      Resource("table", name))

    def _maybe_refresh_catalog(self, stmt: str) -> None:
        """Rebuild the dynamic pg_catalog views lazily: only when DDL
        happened since the last build AND the statement touches catalog
        tables. (The reference recomputes on every scan, pg_class.rs:84 —
        the dirty flag is our many-tables-scale improvement.)"""
        if not getattr(self, "_catalog_dirty", False):
            return
        low = stmt.lower()
        if "pg_" in low or "information_schema" in low or "regclass" in low:
            from datafusion_postgres_spark.catalog.pg_catalog import refresh
            refresh(self.spark)
            self._catalog_dirty = False


class FailedTransactionError(RuntimeError):
    sqlstate = "25P01"


def _dml_row_count(df: DataFrame) -> int:
    """Affected-row count from the executed command's metrics (Spark's
    InsertInto* commands expose numOutputRows; DataFusion surfaces an
    explicit count column — handlers.rs:354-376)."""
    try:
        plan = df._jdf.queryExecution().executedPlan()
        # CommandResultExec wraps the real write command; its own
        # numOutputRows counts result rows (0 for DML) — read the child's.
        if plan.getClass().getSimpleName() == "CommandResultExec":
            plan = plan.commandPhysicalPlan()
        metrics = plan.metrics()
        for key in ("numOutputRows", "numInsertedRows", "numAffectedRows"):
            if metrics.contains(key):
                return int(metrics.apply(key).value())
    except Exception:
        pass
    return 0
