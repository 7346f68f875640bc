"""PostgreSQL wire-protocol (v3) server frontend.

Reference parity: the pgwire serving layer
(``datafusion-postgres/src/lib.rs:87-195`` server setup + accept loop,
``handlers.rs`` simple/extended query handlers). Implemented from the
public PostgreSQL Frontend/Backend protocol documentation.

Per connection: its own ``SparkPgEngine`` over ``spark.newSession()`` —
isolated temp views + conf, shared executors/cache (our improvement over
the reference's shared-SessionContext TimeZone mutation, SURVEY.md §7).

Supported: startup (trust auth / cleartext password), SSLRequest refusal,
simple query protocol (multi-statement), extended protocol
(Parse/Bind/Describe/Execute/Close/Sync/Flush), ParameterStatus
broadcast, transaction-status-aware ReadyForQuery, error responses with
SQLSTATE, connection limit semaphore, Terminate.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from datafusion_postgres_spark.server.encoder import (
    encode_row, schema_to_pg_fields,
)
from datafusion_postgres_spark.server.prepared import (
    PreparedStatementManager,
)
from datafusion_postgres_spark.server.session_state import (
    PARAMETER_STATUS_VARS, TxnState,
)

PROTOCOL_V3 = 196608
SSL_REQUEST = 80877103
CANCEL_REQUEST = 80877102
GSSENC_REQUEST = 80877104


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _sqlstate_of(exc: Exception) -> str:
    """Engine errors carry .sqlstate; PySpark exceptions expose
    getSqlState() (Spark's own error classes map to standard SQLSTATEs,
    e.g. TABLE_OR_VIEW_NOT_FOUND -> 42P01)."""
    state = getattr(exc, "sqlstate", None)
    if state:
        return state
    getter = getattr(exc, "getSqlState", None)
    if getter:
        try:
            state = getter()
            if state:
                return state
        except Exception:
            pass
    # Spark job-group cancellation (CancelRequest / statement timeout)
    # surfaces as a generic SparkException mentioning the cancelled group
    if "cancelled" in str(exc).lower() or "canceled" in str(exc).lower():
        return "57014"
    return "XX000"


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _CopyFailed(RuntimeError):
    sqlstate = "57014"  # QUERY_CANCELED, per pg's COPY-fail handling


class _Conn(socketserver.BaseRequestHandler):
    # class attrs injected by PgWireServer: engine_factory, auth, password_mode

    def handle(self):
        self.sock = self.request
        self.buf = b""
        self.engine = None
        self._in_error = False  # extended-protocol: discard until Sync
        self.backend_key = None
        try:
            if not self._startup():
                return
            self.engine = self.server.engine_factory()
            # RBAC checks run as the authenticated user (auth.rs wiring)
            self.engine.user = self.client_user
            self.engine.auth = self.server.auth
            self.prepared = PreparedStatementManager(self.engine)
            self.portals = {}
            # suspended-portal row iterators: Execute with max_rows that
            # stops mid-result parks (rows_iter, res, fmts) here so the
            # next Execute on the portal RESUMES instead of re-running
            # (protocol spec: a portal is a live cursor until Close/
            # re-Bind; JDBC setFetchSize drives this path)
            self.portal_iters = {}
            # cancellation identity: BackendKeyData -> job group
            # (handlers.rs CancelHandler analog)
            self.backend_key = self.server.cancel_registry.register(
                self.engine.spark)
            self._send_auth_ok_and_status()
            self._main_loop()
        except (ConnectionError, OSError):
            pass
        finally:
            if self.backend_key is not None:
                self.server.cancel_registry.unregister(self.backend_key[0])

    # -- plumbing ----------------------------------------------------------
    def _recv_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("client disconnected")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _send(self, data: bytes) -> None:
        self.sock.sendall(data)

    # -- startup -----------------------------------------------------------
    def _startup(self) -> bool:
        while True:
            (length,) = struct.unpack("!I", self._recv_exact(4))
            payload = self._recv_exact(length - 4)
            (code,) = struct.unpack("!I", payload[:4])
            if code == SSL_REQUEST:
                ctx = getattr(self.server, "ssl_context", None)
                if ctx is None:
                    self._send(b"N")  # TLS not configured
                    continue
                # accept: 'S' then immediately wrap the socket (lib.rs:40-64
                # TLS acceptor analog); the startup packet arrives encrypted
                self._send(b"S")
                assert not self.buf, "client sent data before TLS handshake"
                import ssl as _ssl
                try:
                    self.sock = ctx.wrap_socket(self.sock, server_side=True)
                except _ssl.SSLError:
                    return False
                continue
            if code == GSSENC_REQUEST:
                self._send(b"N")
                continue
            if code == CANCEL_REQUEST:
                # out-of-band cancel: (pid, secret) -> cancel that
                # connection's running job group, then close (the protocol
                # sends no response on a cancel connection)
                pid, secret = struct.unpack("!II", payload[4:12])
                self.server.cancel_registry.cancel(pid, secret)
                return False
            if code != PROTOCOL_V3:
                self._error("08P01", f"unsupported protocol {code}")
                return False
            params = payload[4:].split(b"\x00")
            kv = dict(zip(params[0::2], params[1::2]))
            self.client_user = kv.get(b"user", b"postgres").decode()
            self.database = kv.get(b"database", b"postgres").decode()
            return self._authenticate()

    def _authenticate(self) -> bool:
        """Pluggable AuthSource analog (auth.rs:461-596): trust, cleartext,
        md5 (code 5 + salt), or scram-sha-256 (SASL, RFC 5802)."""
        mode = self.server.password_mode
        if mode == "trust":
            return True
        if mode == "md5":
            return self._auth_md5()
        if mode in ("scram", "scram-sha-256"):
            return self._auth_scram()
        return self._auth_cleartext()

    def _recv_password_message(self) -> bytes | None:
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        payload = self._recv_exact(length - 4)
        if tag != b"p":
            self._error("08P01", "expected PasswordMessage")
            return None
        return payload

    def _auth_failed(self) -> None:
        self._error("28P01", f'password authentication failed for user '
                             f'"{self.client_user}"')

    def _auth_cleartext(self) -> bool:
        self._send(_msg(b"R", struct.pack("!I", 3)))
        payload = self._recv_password_message()
        if payload is None:
            return False
        password = payload.rstrip(b"\x00").decode()
        from datafusion_postgres_spark.server.auth import verify_cleartext
        if not verify_cleartext(self.server.auth, self.client_user, password):
            self._auth_failed()
            return False
        return True

    def _auth_md5(self) -> bool:
        import os as _os
        salt = _os.urandom(4)
        self._send(_msg(b"R", struct.pack("!I", 5) + salt))
        payload = self._recv_password_message()
        if payload is None:
            return False
        response = payload.rstrip(b"\x00").decode()
        from datafusion_postgres_spark.server.auth import verify_md5
        if not verify_md5(self.server.auth, self.client_user, response, salt):
            self._auth_failed()
            return False
        return True

    def _auth_scram(self) -> bool:
        """SCRAM-SHA-256 server side (RFC 5802/7677): AuthenticationSASL ->
        client-first -> SASLContinue(server-first) -> client-final ->
        SASLFinal(verifier) + AuthenticationOk."""
        from datafusion_postgres_spark.server.auth import ScramServer

        self._send(_msg(b"R", struct.pack("!I", 10) +
                        _cstr("SCRAM-SHA-256") + b"\x00"))
        payload = self._recv_password_message()
        if payload is None:
            return False
        # SASLInitialResponse: mechanism cstr + int32 len + client-first
        mech_end = payload.index(b"\x00")
        mechanism = payload[:mech_end].decode()
        if mechanism != "SCRAM-SHA-256":
            self._error("28000", f"unsupported SASL mechanism {mechanism}")
            return False
        (resp_len,) = struct.unpack("!i", payload[mech_end + 1:mech_end + 5])
        client_first = payload[mech_end + 5:mech_end + 5 + max(resp_len, 0)]
        user = self.server.auth.users.get(self.client_user)
        if user is None or user.password is None:
            self._auth_failed()
            return False
        scram = ScramServer(self.client_user, user.password)
        try:
            server_first = scram.handle_client_first(client_first.decode())
        except ValueError as exc:
            self._error("28000", str(exc))
            return False
        self._send(_msg(b"R", struct.pack("!I", 11) + server_first.encode()))
        payload = self._recv_password_message()
        if payload is None:
            return False
        try:
            server_final = scram.handle_client_final(payload.decode())
        except ValueError:
            self._auth_failed()
            return False
        self._send(_msg(b"R", struct.pack("!I", 12) + server_final.encode()))
        return True

    def _send_auth_ok_and_status(self):
        out = _msg(b"R", struct.pack("!I", 0))
        state = self.engine.state
        status = {
            "server_version": state.get_var("server_version"),
            "server_encoding": "UTF8",
            "client_encoding": "UTF8",
            "DateStyle": state.get_var("datestyle"),
            "TimeZone": state.get_var("timezone"),
            "integer_datetimes": "on",
            "standard_conforming_strings": "on",
            "is_superuser": "on",
            "session_authorization": self.client_user,
        }
        for k, v in status.items():
            out += _msg(b"S", _cstr(k) + _cstr(v))
        pid, secret = self.backend_key
        out += _msg(b"K", struct.pack("!II", pid, secret))  # BackendKeyData
        out += self._ready()
        self._send(out)

    def _ready(self) -> bytes:
        status = {TxnState.IDLE: b"I", TxnState.TRANSACTION: b"T",
                  TxnState.ERROR: b"E"}[self.engine.state.txn]
        return _msg(b"Z", status)

    def _error(self, sqlstate: str, message: str) -> None:
        payload = (b"S" + _cstr("ERROR") + b"V" + _cstr("ERROR") +
                   b"C" + _cstr(sqlstate) + b"M" + _cstr(message) + b"\x00")
        self._send(_msg(b"E", payload))

    # -- main loop ---------------------------------------------------------
    def _main_loop(self):
        while True:
            tag = self._recv_exact(1)
            (length,) = struct.unpack("!I", self._recv_exact(4))
            payload = self._recv_exact(length - 4)
            if tag == b"X":
                return
            # after an extended-protocol error, discard messages until Sync
            # (protocol spec: avoids desyncing pipelined clients)
            if self._in_error and tag in (b"P", b"B", b"D", b"E", b"C", b"H",
                                          b"p"):
                continue
            handler = {b"Q": self._on_query, b"P": self._on_parse,
                       b"B": self._on_bind, b"D": self._on_describe,
                       b"E": self._on_execute, b"C": self._on_close,
                       b"S": self._on_sync, b"H": self._on_flush,
                       b"p": lambda _: None}.get(tag)
            if handler is None:
                self._error("08P01", f"unknown message type {tag!r}")
                self._send(self._ready())
                continue
            handler(payload)

    # -- simple query ------------------------------------------------------
    def _on_query(self, payload: bytes):
        sql = payload.rstrip(b"\x00").decode()
        self._in_error = False  # simple query resets extended error state
        try:
            if not sql.strip():
                self._send(_msg(b"I", b""))  # EmptyQueryResponse
                self._send(self._ready())
                return
            self._enter_job_group()
            results = self.engine.execute(sql)
            for res in results:
                self._send_result(res, max_rows=0)
                self._maybe_parameter_status(sql)
        except Exception as exc:
            self.engine.state.statement_failed()
            self._error(_sqlstate_of(exc), str(exc).split("\n")[0][:500])
        self._send(self._ready())

    def _enter_job_group(self):
        """Tag this connection's Spark jobs with its cancellation group so
        an out-of-band CancelRequest can cancel exactly this statement."""
        try:
            self.server.cancel_registry.enter(self.backend_key[0],
                                              self.engine.spark)
        except Exception:
            pass

    def _send_result(self, res, max_rows: int):
        if res.command_tag == "COPY_OUT":
            self._send_copy_out(res)
            return
        if res.command_tag == "COPY_IN":
            self._handle_copy_in(res)
            return
        if res.df is None:
            self._send(_msg(b"C", _cstr(res.command_tag)))
            return
        fields = schema_to_pg_fields(res.df.schema)
        self._send(self._row_description(fields))
        schema = res.df.schema
        timeout = self.engine.state.statement_timeout_secs()
        n = 0
        efd = int(self.engine.state.get_var("extra_float_digits") or 1)
        for row in (res.collect(timeout) if timeout > 0 else res.rows()):
            values = encode_row(row, schema, efd)
            buf = struct.pack("!H", len(values))
            for v in values:
                if v is None:
                    buf += struct.pack("!i", -1)
                else:
                    b = v.encode()
                    buf += struct.pack("!I", len(b)) + b
            self._send(_msg(b"D", buf))
            n += 1
            if max_rows and n >= max_rows:
                break
        tag = res.command_tag
        if tag == "SELECT":
            tag = f"SELECT {n}"
        self._send(_msg(b"C", _cstr(tag)))

    def _recv_message(self) -> tuple[bytes, bytes]:
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return tag, self._recv_exact(length - 4)

    def _handle_copy_in(self, res):
        """COPY table FROM STDIN: CopyInResponse, then accumulate CopyData
        until CopyDone/CopyFail, then ingest via engine.copy_into.

        The target table/columns were validated by the hook BEFORE entering
        copy mode, so the client only ever sees data-level errors here."""
        ncols = res.copy_ncols
        self._send(_msg(b"G", struct.pack("!bH", 0, ncols) +
                        struct.pack(f"!{ncols}H", *([0] * ncols))))
        buf = bytearray()
        fail = None
        while True:
            tag, payload = self._recv_message()
            if tag == b"d":
                buf += payload
            elif tag == b"c":
                break
            elif tag == b"f":
                fail = payload.split(b"\x00")[0].decode("utf-8", "replace")
                break
            elif tag in (b"H", b"S"):
                continue  # Flush/Sync are legal mid-copy, no-ops here
            else:
                fail = f"unexpected message {tag!r} during COPY"
                break
        if fail is not None:
            raise _CopyFailed(fail)
        n = self.engine.copy_into(
            res.copy_table, res.copy_columns, bytes(buf),
            getattr(res, "copy_format", "text"),
            getattr(res, "copy_delimiter", None),
            getattr(res, "copy_null", None),
            getattr(res, "copy_header", False))
        self._send(_msg(b"C", _cstr(f"COPY {n}")))

    def _send_copy_out(self, res):
        """COPY ... TO STDOUT: CopyOutResponse + CopyData rows.
        text format: tab-separated, \\N for NULL; csv: comma-separated,
        empty NULL, optional header; binary: PGCOPY signature +
        length-prefixed tuples in the binary wire encoding."""
        schema = res.df.schema
        n_cols = len(schema.fields)
        if getattr(res, "copy_format", "text") == "binary":
            self._send_copy_out_binary(res, schema, n_cols)
            return
        self._send(_msg(b"H", struct.pack("!bH", 0, n_cols) +
                        struct.pack(f"!{n_cols}H", *([0] * n_cols))))
        csv = getattr(res, "copy_format", "text") == "csv"
        efd = int(self.engine.state.get_var("extra_float_digits") or 1)
        if csv and getattr(res, "copy_header", False):
            header = ",".join(f.name for f in schema.fields) + "\n"
            self._send(_msg(b"d", header.encode()))
        n = 0
        for row in res.rows():
            values = encode_row(row, schema, efd)
            if csv:
                cells = ["" if v is None else
                         ('"' + v.replace('"', '""') + '"'
                          if any(c in v for c in ',"\n') else v)
                         for v in values]
                line = ",".join(cells) + "\n"
            else:
                cells = ["\\N" if v is None else
                         v.replace("\\", "\\\\").replace("\t", "\\t")
                          .replace("\n", "\\n") for v in values]
                line = "\t".join(cells) + "\n"
            self._send(_msg(b"d", line.encode()))
            n += 1
        self._send(_msg(b"c", b""))
        self._send(_msg(b"C", _cstr(f"COPY {n}")))

    def _send_copy_out_binary(self, res, schema, n_cols: int):
        from datafusion_postgres_spark.server.copy_data import (
            COPY_BINARY_SIGNATURE)
        from datafusion_postgres_spark.server.encoder import (
            encode_value_binary, supports_binary)

        bad = [f.name for f in schema.fields
               if not supports_binary(f.dataType)]
        if bad:
            raise RuntimeError(
                f"COPY binary cannot encode column(s): {', '.join(bad)}")
        # overall format 1, every column binary
        self._send(_msg(b"H", struct.pack("!bH", 1, n_cols) +
                        struct.pack(f"!{n_cols}H", *([1] * n_cols))))
        self._send(_msg(b"d", COPY_BINARY_SIGNATURE +
                        struct.pack("!ii", 0, 0)))
        n = 0
        for row in res.rows():
            buf = struct.pack("!h", n_cols)
            for v, fld in zip(row, schema.fields):
                if v is None:
                    buf += struct.pack("!i", -1)
                else:
                    b = encode_value_binary(v, fld.dataType)
                    buf += struct.pack("!i", len(b)) + b
            self._send(_msg(b"d", buf))
            n += 1
        self._send(_msg(b"d", struct.pack("!h", -1)))
        self._send(_msg(b"c", b""))
        self._send(_msg(b"C", _cstr(f"COPY {n}")))

    def _row_description(self, fields) -> bytes:
        buf = struct.pack("!H", len(fields))
        for f in fields:
            buf += (_cstr(f.name) + struct.pack("!IhIhih", 0, 0, f.type_oid,
                                                f.typlen, f.typmod, 0))
        return _msg(b"T", buf)

    def _maybe_parameter_status(self, sql: str):
        """After a SET, broadcast ParameterStatus for known vars
        (set_show.rs:139-246)."""
        kind = self.engine.transpiler.statement_kind(sql)
        if kind != "SET":
            return
        for var in PARAMETER_STATUS_VARS:
            val = self.engine.state.get_var(var)
            if val:
                name = {"timezone": "TimeZone",
                        "datestyle": "DateStyle"}.get(var, var)
                self._send(_msg(b"S", _cstr(name) + _cstr(val)))

    # -- extended protocol -------------------------------------------------
    def _on_parse(self, payload: bytes):
        try:
            name_end = payload.index(b"\x00")
            name = payload[:name_end].decode()
            rest = payload[name_end + 1:]
            sql_end = rest.index(b"\x00")
            sql = rest[:sql_end].decode()
            # int16 count + OID list after the query string: OIDs a client
            # DECLARES (psycopg binary params declare int8 etc.) take
            # precedence over cast-inference — discarding them made binary
            # Bind decode the raw bytes as text (OID 25)
            rest = rest[sql_end + 1:]
            declared: list[int] = []
            if len(rest) >= 2:
                (n_oids,) = struct.unpack("!H", rest[:2])
                rest = rest[2:]
                for _ in range(n_oids):
                    if len(rest) < 4:
                        break
                    (oid,) = struct.unpack("!I", rest[:4])
                    declared.append(oid)
                    rest = rest[4:]
            self.prepared.parse(name or "", sql, declared_oids=declared)
            self._send(_msg(b"1", b""))
        except Exception as exc:
            self._in_error = True
            self._error(_sqlstate_of(exc), str(exc)[:300])

    def _on_bind(self, payload: bytes):
        try:
            i = payload.index(b"\x00")
            portal = payload[:i].decode()
            rest = payload[i + 1:]
            j = rest.index(b"\x00")
            stmt_name = rest[:j].decode()
            rest = rest[j + 1:]
            (n_fmt,) = struct.unpack("!H", rest[:2])
            fmts = list(struct.unpack(f"!{n_fmt}H", rest[2:2 + 2 * n_fmt]))
            rest = rest[2 + 2 * n_fmt:]
            (n_params,) = struct.unpack("!H", rest[:2])
            rest = rest[2:]
            params = []
            for k in range(n_params):
                # one format code applies to all params; else per-param
                fmt = (fmts[k] if len(fmts) == n_params else
                       (fmts[0] if fmts else 0))
                (plen,) = struct.unpack("!i", rest[:4])
                rest = rest[4:]
                if plen < 0:
                    params.append(None)
                elif fmt == 1:
                    params.append(("bin", rest[:plen]))
                    rest = rest[plen:]
                else:
                    params.append(rest[:plen].decode())
                    rest = rest[plen:]
            # result-format codes: 0=all text, 1 code=applies to every
            # column, else per-column
            result_formats = []
            if len(rest) >= 2:
                (n_rfmt,) = struct.unpack("!H", rest[:2])
                rest = rest[2:]
                for _ in range(n_rfmt):
                    (code,) = struct.unpack("!H", rest[:2])
                    rest = rest[2:]
                    result_formats.append(code)
            self.portals[portal or ""] = (stmt_name or "", params,
                                          result_formats)
            self.portal_iters.pop(portal or "", None)  # re-Bind resets
            self._send(_msg(b"2", b""))
        except Exception as exc:
            self._in_error = True
            self._error(_sqlstate_of(exc), str(exc)[:300])

    def _on_describe(self, payload: bytes):
        kind, name = payload[:1], payload[1:].rstrip(b"\x00").decode()
        try:
            if kind == b"S":
                stmt = self.prepared.describe(name or "")
                buf = struct.pack("!H", stmt.num_params)
                for oid in stmt.param_oids:
                    buf += struct.pack("!I", oid)
                self._send(_msg(b"t", buf))
                self._send(self._describe_statement_rowdesc(stmt))
            else:
                stmt_name = self.portals.get(name or "", ("", [], []))[0]
                stmt = self.prepared.describe(stmt_name)
                self._send(self._describe_statement_rowdesc(stmt))
        except KeyError:
            self._in_error = True
            self._error("26000",
                        f'prepared statement "{name}" does not exist')

    def _describe_statement_rowdesc(self, stmt) -> bytes:
        # Only SELECT-shaped statements get a schema probe: Spark executes
        # commands (INSERT / CTAS / DDL) EAGERLY inside spark.sql(), so
        # probing a DML statement at Describe time would actually run it
        # (with NULL parameters), then again at Execute. Clients that
        # Describe before Execute (psycopg, JDBC) hit this on every write.
        kind = self.engine.transpiler.statement_kind(stmt.sql)
        if kind not in ("SELECT", "WITH", "VALUES", "EXPLAIN", "TABLE"):
            return _msg(b"n", b"")  # NoData
        try:
            spark_sql = self.engine.transpiler.transpile(stmt.sql)
            from datafusion_postgres_spark.server.prepared import to_named_params
            spark_sql = to_named_params(spark_sql)
            nulls = {f"p{i + 1}": None for i in range(stmt.num_params)}
            df = self.engine.spark.sql(spark_sql, args=nulls) if nulls else \
                self.engine.spark.sql(spark_sql)
            fields = schema_to_pg_fields(df.schema)
            return self._row_description(fields)
        except Exception:
            return _msg(b"n", b"")  # NoData

    def _on_execute(self, payload: bytes):
        i = payload.index(b"\x00")
        portal = payload[:i].decode()
        (max_rows,) = struct.unpack("!I", payload[i + 1:i + 5])
        key = portal or ""
        try:
            if key in self.portal_iters:
                # resume the suspended portal — do NOT re-execute
                rows, res, fmts, n0 = self.portal_iters.pop(key)
                self._stream_portal_rows(key, rows, res, fmts, max_rows, n0)
                return
            stmt_name, params, result_formats = self.portals[key]
            self._enter_job_group()
            res = self.prepared.execute(stmt_name, params)
            self._send_result_no_rowdesc(key, res, max_rows, result_formats)
        except Exception as exc:
            self.engine.state.statement_failed()
            self._in_error = True
            self._error(_sqlstate_of(exc), str(exc)[:500])

    def _send_result_no_rowdesc(self, portal_key, res, max_rows: int,
                                result_formats=None):
        from datafusion_postgres_spark.server.encoder import supports_binary

        if res.command_tag == "COPY_OUT":
            self._send_copy_out(res)
            return
        if res.command_tag == "COPY_IN":
            self._handle_copy_in(res)
            return
        if res.df is None:
            # DML/DDL/utility: the tag already carries kind + rowcount
            # ("INSERT 0 n" etc.) — clients derive rowcount from it
            self._send(_msg(b"C", _cstr(res.command_tag)))
            return
        fields = res.df.schema.fields
        # expand the Bind result-format codes to one per column
        fmts = result_formats or []
        if len(fmts) == 1:
            fmts = fmts * len(fields)
        elif len(fmts) != len(fields):
            fmts = [0] * len(fields)
        # binary only where the type supports it; else text fallback
        fmts = [1 if (f == 1 and supports_binary(fld.dataType)) else 0
                for f, fld in zip(fmts, fields)]
        timeout = self.engine.state.statement_timeout_secs()
        rows = iter(res.collect(timeout) if timeout > 0 else res.rows())
        self._stream_portal_rows(portal_key, rows, res, fmts, max_rows, 0)

    def _stream_portal_rows(self, portal_key, rows, res, fmts,
                            max_rows: int, n: int):
        """Send DataRows from a (possibly resumed) portal iterator; on
        hitting max_rows, park the iterator for the next Execute."""
        from datafusion_postgres_spark.server.encoder import (
            encode_value, encode_value_binary)

        fields = res.df.schema.fields
        efd = int(self.engine.state.get_var("extra_float_digits") or 1)
        sent = 0
        for row in rows:
            buf = struct.pack("!H", len(fields))
            for v, fld, fmt in zip(row, fields, fmts):
                if v is None:
                    buf += struct.pack("!i", -1)
                elif fmt == 1:
                    b = encode_value_binary(v, fld.dataType)
                    buf += struct.pack("!I", len(b)) + b
                else:
                    b = encode_value(v, fld.dataType, efd).encode()
                    buf += struct.pack("!I", len(b)) + b
            self._send(_msg(b"D", buf))
            n += 1
            sent += 1
            if max_rows and sent >= max_rows:
                self.portal_iters[portal_key] = (rows, res, fmts, n)
                self._send(_msg(b"s", b""))  # PortalSuspended
                return
        tag = res.command_tag
        if tag == "SELECT":
            tag = f"SELECT {n}"
        self._send(_msg(b"C", _cstr(tag)))

    def _on_close(self, payload: bytes):
        kind, name = payload[:1], payload[1:].rstrip(b"\x00").decode()
        if kind == b"S":
            self.prepared.close(name or "")
        else:
            self.portals.pop(name or "", None)
            self.portal_iters.pop(name or "", None)
        self._send(_msg(b"3", b""))

    def _on_sync(self, _payload: bytes):
        self._in_error = False
        self._send(self._ready())

    def _on_flush(self, _payload: bytes):
        pass


class CancelRegistry:
    """(pid, secret) -> Spark job group, for out-of-band CancelRequest
    (the reference's CancelHandler, handlers.rs:14,50,103).

    Each connection gets a generated BackendKeyData at startup and tags
    its statements' Spark jobs with a per-connection job group
    (thread-local on the submitting thread, so concurrent connections
    don't collide); a CancelRequest on a second socket cancels exactly
    that group."""

    def __init__(self):
        import os as _os
        self._lock = threading.Lock()
        self._next_pid = _os.getpid() % 100000 + 1000
        self._conns: dict[int, tuple[int, str]] = {}  # pid -> (secret, group)
        self._sparks: dict[int, object] = {}

    def register(self, spark) -> tuple[int, int]:
        import secrets as _secrets
        with self._lock:
            pid = self._next_pid
            self._next_pid += 1
            secret = _secrets.randbits(31)
            self._conns[pid] = (secret, f"pgwire-conn-{pid}")
            self._sparks[pid] = spark
        return pid, secret

    def unregister(self, pid: int) -> None:
        with self._lock:
            self._conns.pop(pid, None)
            self._sparks.pop(pid, None)

    def enter(self, pid: int, spark) -> None:
        """Called on the connection's executing thread before a statement:
        job-group tags are per-thread, so this marks every job the
        statement submits."""
        info = self._conns.get(pid)
        if info:
            spark.sparkContext.setJobGroup(info[1], f"pgwire pid={pid}",
                                           interruptOnCancel=True)

    def cancel(self, pid: int, secret: int) -> bool:
        with self._lock:
            info = self._conns.get(pid)
            spark = self._sparks.get(pid)
        if not info or info[0] != secret or spark is None:
            return False  # bad secret: ignore silently, per protocol
        try:
            spark.sparkContext.cancelJobGroup(info[1])
            return True
        except Exception:
            return False


class PgWireServer:
    """Threaded pg-wire server over a shared SparkSession (lib.rs:121-195
    accept-loop analog; max_connections via socketserver thread pool)."""

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 5432,
                 password_mode: str = "trust", auth=None,
                 max_connections: int = 100,
                 ssl_certfile: str | None = None,
                 ssl_keyfile: str | None = None):
        from datafusion_postgres_spark.server.auth import AuthManager
        from datafusion_postgres_spark.session import SparkPgEngine

        self.spark = spark
        self.auth = auth or AuthManager()
        ssl_context = None
        if ssl_certfile:
            import ssl
            ssl_context = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ssl_context.load_cert_chain(ssl_certfile, ssl_keyfile)

        def engine_factory():
            return SparkPgEngine(spark.newSession())

        sem = threading.BoundedSemaphore(max_connections)

        class _Server(socketserver.ThreadingTCPServer):
            # connection-limit semaphore (lib.rs:121-195 max_connections)
            allow_reuse_address = True
            daemon_threads = True

            def verify_request(self, request, client_address):
                if not sem.acquire(blocking=False):
                    try:
                        request.sendall(_msg(b"E", b"S" + _cstr("FATAL") +
                                             b"C" + _cstr("53300") +
                                             b"M" + _cstr(
                                                 "too many connections") +
                                             b"\x00"))
                    except OSError:
                        pass
                    return False
                return True

            def close_request(self, request):
                sem.release()
                super().close_request(request)

        self._server = _Server((host, port), _Conn)
        self._server.engine_factory = engine_factory
        self._server.auth = self.auth
        self._server.password_mode = password_mode
        self._server.cancel_registry = CancelRegistry()
        self._server.ssl_context = ssl_context
        self.host, self.port = self._server.server_address

    def serve_forever(self):
        self._server.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._server.shutdown()
        self._server.server_close()
        try:
            from datafusion_postgres_spark.operators.cachectl import (
                release_operator_caches,
            )
            release_operator_caches()
        except Exception:
            pass  # Spark may already be stopped
