"""pg-wire protocol end-to-end tests with a frame-level client
(the reference's tests-integration analog, minus psycopg which is not in
this container — the mini client speaks protocol v3 directly)."""

import socket
import struct

import pytest

from datafusion_postgres_spark.server.pgwire import PgWireServer


class MiniPgClient:
    """Just enough of the v3 frontend protocol for tests."""

    def __init__(self, host, port, user="postgres", password=None):
        self.sock = socket.create_connection((host, port), timeout=60)
        self.buf = b""
        payload = struct.pack("!I", 196608)
        payload += b"user\x00" + user.encode() + b"\x00"
        payload += b"database\x00postgres\x00\x00"
        self.sock.sendall(struct.pack("!I", len(payload) + 4) + payload)
        self.password = password
        self.params = {}
        self._consume_until_ready()

    def _recv_exact(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_message(self):
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return tag, self._recv_exact(length - 4)

    def _consume_until_ready(self):
        msgs = []
        while True:
            tag, payload = self.read_message()
            if tag == b"R":
                (code,) = struct.unpack("!I", payload[:4])
                if code == 3:  # cleartext password
                    body = self.password.encode() + b"\x00"
                    self.sock.sendall(
                        b"p" + struct.pack("!I", len(body) + 4) + body)
                    continue
            if tag == b"S":
                k, v = payload.split(b"\x00")[:2]
                self.params[k.decode()] = v.decode()
            msgs.append((tag, payload))
            if tag == b"Z":
                self.txn_status = payload
                return msgs
            if tag == b"E":
                self.last_error = payload
                if not any(t == b"R" for t, _ in msgs):
                    return msgs

    def query(self, sql):
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        rows, cols, tags, errors = [], [], [], []
        while True:
            tag, payload = self.read_message()
            if tag == b"T":
                (n,) = struct.unpack("!H", payload[:2])
                cols, off = [], 2
                for _ in range(n):
                    end = payload.index(b"\x00", off)
                    name = payload[off:end].decode()
                    off = end + 1 + 18
                    cols.append(name)
            elif tag == b"D":
                (n,) = struct.unpack("!H", payload[:2])
                off, row = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", payload[off:off + 4])
                    off += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(payload[off:off + ln].decode())
                        off += ln
                rows.append(row)
            elif tag == b"C":
                tags.append(payload.rstrip(b"\x00").decode())
            elif tag == b"E":
                fields = {p[:1]: p[1:].decode() for p in
                          payload.split(b"\x00") if p}
                errors.append(fields)
            elif tag == b"S":
                k, v = payload.split(b"\x00")[:2]
                self.params[k.decode()] = v.decode()
            elif tag == b"Z":
                self.txn_status = payload
                return {"cols": cols, "rows": rows, "tags": tags,
                        "errors": errors}

    def copy_in(self, sql, data: bytes = b"", fail: str | None = None):
        """Send a COPY ... FROM STDIN and drive the copy-in sub-protocol."""
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        tags, errors, got_copy_in = [], [], False
        while True:
            tag, payload = self.read_message()
            if tag == b"G":
                got_copy_in = True
                if fail is not None:
                    b = fail.encode() + b"\x00"
                    self.sock.sendall(
                        b"f" + struct.pack("!I", len(b) + 4) + b)
                else:
                    self.sock.sendall(
                        b"d" + struct.pack("!I", len(data) + 4) + data)
                    self.sock.sendall(b"c" + struct.pack("!I", 4))
            elif tag == b"C":
                tags.append(payload.rstrip(b"\x00").decode())
            elif tag == b"E":
                errors.append({p[:1]: p[1:].decode() for p in
                               payload.split(b"\x00") if p})
            elif tag == b"Z":
                self.txn_status = payload
                return {"tags": tags, "errors": errors,
                        "copy_in": got_copy_in}

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


@pytest.fixture(scope="module")
def server(spark):
    srv = PgWireServer(spark, port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server):
    c = MiniPgClient(server.host, server.port)
    c.query("SELECT 1")  # warm the session
    yield c
    c.close()


class TestSimpleQuery:
    def test_startup_parameter_status(self, client):
        assert client.params["server_version"].startswith("15.0")
        assert client.params["client_encoding"] == "UTF8"

    def test_select_literal(self, client):
        res = client.query("SELECT 1 AS one, 'x' AS s, true AS b")
        assert res["cols"] == ["one", "s", "b"]
        assert res["rows"] == [["1", "x", "t"]]
        assert res["tags"] == ["SELECT 1"]

    def test_table_query(self, client, server):
        client.query(
            "CREATE OR REPLACE TEMPORARY VIEW wnation AS "
            "SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`")
        res = client.query(
            "SELECT n_name FROM wnation WHERE n_nationkey < 3 ORDER BY 1")
        assert [r[0] for r in res["rows"]] == ["NATION_0", "NATION_1",
                                              "NATION_2"]

    def test_multi_statement(self, client):
        res = client.query("SELECT 1 AS a; SELECT 2 AS b")
        assert res["tags"] == ["SELECT 1", "SELECT 1"]
        assert res["rows"] == [["1"], ["2"]]

    def test_postgres_dialect(self, client):
        res = client.query(
            "SELECT 2.5::int8 AS r, version() "
            )
        assert res["rows"][0][0] == "2"
        assert "PostgreSQL" in res["rows"][0][1]

    def test_error_has_sqlstate(self, client):
        res = client.query("SELECT * FROM missing_table_pgwire")
        assert res["errors"]
        assert res["errors"][0][b"C"] == "42P01"
        # connection still usable
        assert client.query("SELECT 1")["rows"] == [["1"]]

    def test_set_show_parameter_status(self, client):
        res = client.query("SET TIME ZONE 'America/Chicago'")
        assert res["tags"] == ["SET"]
        assert client.params["TimeZone"] == "America/Chicago"
        res = client.query("SHOW TimeZone")
        assert res["rows"] == [["America/Chicago"]]
        client.query("SET TIME ZONE 'UTC'")

    def test_transaction_status_byte(self, client):
        client.query("BEGIN")
        assert client.txn_status == b"T"
        client.query("SELECT * FROM missing_tbl_x")
        assert client.txn_status == b"E"
        client.query("ROLLBACK")
        assert client.txn_status == b"I"

    def test_null_encoding(self, client):
        res = client.query("SELECT CAST(NULL AS INT) AS n")
        assert res["rows"] == [[None]]

    def test_array_and_struct(self, client):
        res = client.query(
            "SELECT array(1,2,3) AS xs, named_struct('a', 1, 'b', 'x') AS st")
        assert res["rows"] == [["{1,2,3}", "(1,x)"]]


class TestExtendedProtocol:
    def _parse(self, client, name, sql):
        body = name.encode() + b"\x00" + sql.encode() + b"\x00" + b"\x00\x00"
        client.sock.sendall(b"P" + struct.pack("!I", len(body) + 4) + body)

    def _bind(self, client, portal, stmt, params):
        body = portal.encode() + b"\x00" + stmt.encode() + b"\x00"
        body += struct.pack("!H", 0)
        body += struct.pack("!H", len(params))
        for p in params:
            if p is None:
                body += struct.pack("!i", -1)
            else:
                body += struct.pack("!I", len(p)) + p.encode()
        body += struct.pack("!H", 0)
        client.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)

    def _execute(self, client, portal, max_rows=0):
        body = portal.encode() + b"\x00" + struct.pack("!I", max_rows)
        client.sock.sendall(b"E" + struct.pack("!I", len(body) + 4) + body)

    def _sync(self, client):
        client.sock.sendall(b"S" + struct.pack("!I", 4))

    def test_parse_bind_execute(self, client):
        self._parse(client, "st1",
                    "SELECT n_name FROM wnation WHERE n_nationkey = $1::int4")
        self._bind(client, "", "st1", ["7"])
        self._execute(client, "")
        self._sync(client)
        rows, tags = [], []
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                rows.append(payload)
            elif tag == b"C":
                tags.append(payload.rstrip(b"\x00").decode())
            elif tag == b"Z":
                break
        assert tags == ["SELECT 1"]
        assert b"NATION_7" in rows[0]

    def test_bind_binary_parameter(self, client):
        """Bind with parameter format code 1: the int8 arrives as 8
        network-order bytes (JDBC setLong path), not text."""
        self._parse(client, "stbin",
                    "SELECT $1::int8 + 1 AS v, $2::text AS s")
        body = b"\x00" + b"stbin\x00"
        body += struct.pack("!HHH", 2, 1, 0)   # per-param formats: bin, text
        body += struct.pack("!H", 2)           # two params
        body += struct.pack("!i", 8) + struct.pack("!q", 41)
        body += struct.pack("!i", 2) + b"hi"
        body += struct.pack("!H", 0)           # all-text results
        client.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)
        self._execute(client, "")
        self._sync(client)
        rows = []
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                rows.append(payload)
            elif tag == b"Z":
                break
        assert rows and b"42" in rows[0] and b"hi" in rows[0]

    def test_parse_declared_oids_binary_param(self, client):
        """The Parse message's declared param-type OIDs must drive binary
        Bind decode: no cast in the SQL, $1 DECLARED int8 (the normal
        psycopg/JDBC binary-param flow). Before round 4 the declared list
        was discarded, so the 8 raw bytes decoded as text garbage."""
        name, sql = b"stdecl", b"SELECT $1 + 1 AS v"
        body = name + b"\x00" + sql + b"\x00"
        body += struct.pack("!HI", 1, 20)      # one declared OID: int8
        client.sock.sendall(b"P" + struct.pack("!I", len(body) + 4) + body)
        bbody = b"\x00" + b"stdecl\x00"
        bbody += struct.pack("!HH", 1, 1)      # all params binary
        bbody += struct.pack("!H", 1)
        bbody += struct.pack("!i", 8) + struct.pack("!q", 99)
        bbody += struct.pack("!H", 0)
        client.sock.sendall(b"B" + struct.pack("!I", len(bbody) + 4) + bbody)
        self._execute(client, "")
        self._sync(client)
        rows = []
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                rows.append(payload)
            elif tag == b"Z":
                break
        assert rows and b"100" in rows[0]

    def test_portal_suspend_resume(self, client):
        """Execute with max_rows suspends the portal; the next Execute
        RESUMES the same iterator (no re-execution, no duplicate rows) —
        the JDBC setFetchSize path."""
        self._parse(client, "stps",
                    "SELECT n_nationkey FROM wnation ORDER BY n_nationkey")
        self._bind(client, "pps", "stps", [])
        self._execute(client, "pps", max_rows=3)
        self._sync(client)
        first, saw_suspend = [], False
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                first.append(payload)
            elif tag == b"s":
                saw_suspend = True
            elif tag == b"Z":
                break
        assert saw_suspend and len(first) == 3

        self._execute(client, "pps", max_rows=0)  # drain the rest
        self._sync(client)
        rest, tags = [], []
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                rest.append(payload)
            elif tag == b"C":
                tags.append(payload.rstrip(b"\x00").decode())
            elif tag == b"Z":
                break
        # 25 nations total: 3 + 22, resumed (not re-sent from the start)
        assert len(rest) == 22
        assert first[0] not in rest
        assert tags == ["SELECT 25"]

    def test_describe_statement(self, client):
        self._parse(client, "st2", "SELECT $1::int8 AS v")
        body = b"S" + b"st2" + b"\x00"
        client.sock.sendall(b"D" + struct.pack("!I", len(body) + 4) + body)
        self._sync(client)
        saw_param_desc = saw_rowdesc = False
        while True:
            tag, payload = client.read_message()
            if tag == b"t":
                (n,) = struct.unpack("!H", payload[:2])
                (oid,) = struct.unpack("!I", payload[2:6])
                assert (n, oid) == (1, 20)  # one int8 param
                saw_param_desc = True
            elif tag == b"T":
                saw_rowdesc = True
            elif tag == b"Z":
                break
        assert saw_param_desc and saw_rowdesc


class TestBinaryFormat:
    def test_binary_result_format(self, client, server):
        """Bind with result-format=1: ints/doubles arrive as network-order
        binary."""
        ext = TestExtendedProtocol()
        ext._parse(client, "bf1", "SELECT 258 AS i, CAST(1.5 AS DOUBLE) AS d, 'txt' AS s")
        # bind with one result-format code = 1 (all binary)
        body = b"\x00" + b"bf1\x00"
        body += struct.pack("!H", 0)          # no param formats
        body += struct.pack("!H", 0)          # no params
        body += struct.pack("!HH", 1, 1)      # one result code: binary
        client.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)
        ext._execute(client, "")
        ext._sync(client)
        data = None
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                data = payload
            elif tag == b"Z":
                break
        assert data is not None
        (n,) = struct.unpack("!H", data[:2])
        assert n == 3
        off = 2
        (l1,) = struct.unpack("!i", data[off:off + 4]); off += 4
        assert l1 == 4
        (i_val,) = struct.unpack("!i", data[off:off + 4]); off += 4
        assert i_val == 258
        (l2,) = struct.unpack("!i", data[off:off + 4]); off += 4
        assert l2 == 8
        (d_val,) = struct.unpack("!d", data[off:off + 8]); off += 8
        assert d_val == 1.5
        (l3,) = struct.unpack("!i", data[off:off + 4]); off += 4
        assert data[off:off + l3] == b"txt"

    def test_binary_array_numeric_interval(self, client, server):
        """Round-2 gap closed: arrays / numeric / interval in binary result
        format (previously NotImplementedError -> text-only fallback)."""
        ext = TestExtendedProtocol()
        ext._parse(client, "bf2",
                   "SELECT array(1, 2, 3) AS arr, "
                   "CAST(12345.6789 AS DECIMAL(12,4)) AS num, "
                   "INTERVAL '1' DAY + INTERVAL '2' HOUR AS iv")
        body = b"\x00" + b"bf2\x00"
        body += struct.pack("!H", 0)
        body += struct.pack("!H", 0)
        body += struct.pack("!HH", 1, 1)      # all binary
        client.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)
        ext._execute(client, "")
        ext._sync(client)
        data = None
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                data = payload
            elif tag == b"Z":
                break
        assert data is not None
        (n,) = struct.unpack("!H", data[:2])
        assert n == 3
        off = 2
        # arr: int4[] {1,2,3}
        (alen,) = struct.unpack("!i", data[off:off + 4]); off += 4
        arr = data[off:off + alen]; off += alen
        ndim, hasnull, elem_oid, dim, lb = struct.unpack("!iiiii", arr[:20])
        assert (ndim, hasnull, elem_oid, dim, lb) == (1, 0, 23, 3, 1)
        vals = []
        p = 20
        for _ in range(dim):
            (el,) = struct.unpack("!i", arr[p:p + 4]); p += 4
            (v,) = struct.unpack("!i", arr[p:p + el]); p += el
            vals.append(v)
        assert vals == [1, 2, 3]
        # num: numeric_send groups
        (nlen,) = struct.unpack("!i", data[off:off + 4]); off += 4
        nd, weight, sign, dscale = struct.unpack("!HhHH", data[off:off + 8])
        digits = struct.unpack(f"!{nd}H", data[off + 8:off + 8 + nd * 2])
        off += nlen
        assert (weight, sign, dscale) == (1, 0, 4)
        assert digits == (1, 2345, 6789)
        # iv: micros, days, months
        (ilen,) = struct.unpack("!i", data[off:off + 4]); off += 4
        assert ilen == 16
        micros, days, months = struct.unpack("!qii", data[off:off + 16])
        assert (micros, days, months) == (2 * 3_600_000_000, 1, 0)

    def _one_binary_row(self, client, stmt_name, sql):
        ext = TestExtendedProtocol()
        ext._parse(client, stmt_name, sql)
        body = b"\x00" + stmt_name.encode() + b"\x00"
        body += struct.pack("!H", 0)
        body += struct.pack("!H", 0)
        body += struct.pack("!HH", 1, 1)      # all binary
        client.sock.sendall(b"B" + struct.pack("!I", len(body) + 4) + body)
        ext._execute(client, "")
        ext._sync(client)
        data = None
        while True:
            tag, payload = client.read_message()
            if tag == b"D":
                data = payload
            elif tag == b"Z":
                break
        return data

    def test_binary_list_of_struct(self, client, server):
        """Round-4: list-of-struct in binary result format — the reference
        encodes nested composites end-to-end (arrow-pg list_encoder.rs /
        struct_encoder.rs; fixture create_arrow_testfile.py). Decode the
        array_send-of-record_send payload field by field."""
        data = self._one_binary_row(
            client, "bf3",
            "SELECT array(named_struct('a', 1, 'b', 'x'), "
            "named_struct('a', 2, 'b', 'y')) AS ls")
        assert data is not None
        (n,) = struct.unpack("!H", data[:2])
        assert n == 1
        (alen,) = struct.unpack("!i", data[2:6])
        arr = data[6:6 + alen]
        ndim, hasnull, elem_oid, dim, lb = struct.unpack("!iiiii", arr[:20])
        assert (ndim, hasnull, elem_oid, dim, lb) == (1, 0, 2249, 2, 1)
        p = 20
        decoded = []
        for _ in range(dim):
            (el,) = struct.unpack("!i", arr[p:p + 4]); p += 4
            rec = arr[p:p + el]; p += el
            (nf,) = struct.unpack("!i", rec[:4])
            assert nf == 2
            q = 4
            oid1, l1 = struct.unpack("!ii", rec[q:q + 8]); q += 8
            (a,) = struct.unpack("!i", rec[q:q + l1]); q += l1
            oid2, l2 = struct.unpack("!ii", rec[q:q + 8]); q += 8
            s = rec[q:q + l2].decode(); q += l2
            assert (oid1, oid2) == (23, 25)
            decoded.append((a, s))
        assert decoded == [(1, "x"), (2, "y")]

    def test_binary_multidim_array(self, client, server):
        """Nested array → PG 2-D array: ndim=2, leaf element OID, leaves
        flattened row-major."""
        data = self._one_binary_row(
            client, "bf4",
            "SELECT array(array(1, 2, 3), array(4, 5, 6)) AS m")
        assert data is not None
        (alen,) = struct.unpack("!i", data[2:6])
        arr = data[6:6 + alen]
        ndim, hasnull, elem_oid = struct.unpack("!iii", arr[:12])
        d1, lb1, d2, lb2 = struct.unpack("!iiii", arr[12:28])
        assert (ndim, hasnull, elem_oid) == (2, 0, 23)
        assert (d1, lb1, d2, lb2) == (2, 1, 3, 1)
        vals, p = [], 28
        for _ in range(d1 * d2):
            (el,) = struct.unpack("!i", arr[p:p + 4]); p += 4
            (v,) = struct.unpack("!i", arr[p:p + el]); p += el
            vals.append(v)
        assert vals == [1, 2, 3, 4, 5, 6]


class TestCopyOut:
    def test_copy_query_to_stdout(self, client):
        body = ("COPY (SELECT n_nationkey, n_name FROM wnation "
                "WHERE n_nationkey < 3 ORDER BY 1) TO STDOUT").encode() + b"\x00"
        client.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        lines, tags = [], []
        saw_copy_out = saw_done = False
        while True:
            tag, payload = client.read_message()
            if tag == b"H":
                saw_copy_out = True
            elif tag == b"d":
                lines.append(payload.decode())
            elif tag == b"c":
                saw_done = True
            elif tag == b"C":
                tags.append(payload.rstrip(b"\x00").decode())
            elif tag == b"Z":
                break
        assert saw_copy_out and saw_done
        assert tags == ["COPY 3"]
        assert lines == ["0\tNATION_0\n", "1\tNATION_1\n", "2\tNATION_2\n"]

    def test_copy_csv_with_header(self, client):
        body = ("COPY (SELECT n_nationkey AS k FROM wnation WHERE "
                "n_nationkey < 2 ORDER BY 1) TO STDOUT WITH (FORMAT csv, "
                "HEADER)").encode() + b"\x00"
        client.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        lines = []
        while True:
            tag, payload = client.read_message()
            if tag == b"d":
                lines.append(payload.decode())
            elif tag == b"Z":
                break
        assert lines == ["k\n", "0\n", "1\n"]

    def test_copy_from_view_rejected(self, client):
        res = client.query("COPY wnation FROM STDIN")
        assert res["errors"] and res["errors"][0][b"C"] == "42809"


class TestCopyIn:
    @pytest.fixture(scope="class", autouse=True)
    def target(self, client):
        client.query("DROP TABLE IF EXISTS copy_tgt")
        client.query("CREATE TABLE copy_tgt (k INT, v STRING, x DOUBLE)")
        yield
        client.query("DROP TABLE IF EXISTS copy_tgt")

    def test_copy_in_text(self, client):
        res = client.copy_in("COPY copy_tgt FROM STDIN",
                             b"1\tone\t1.5\n2\t\\N\t2.5\n")
        assert res["copy_in"] and not res["errors"]
        assert res["tags"] == ["COPY 2"]
        got = client.query("SELECT * FROM copy_tgt ORDER BY k")
        assert got["rows"] == [["1", "one", "1.5"], ["2", None, "2.5"]]

    def test_copy_in_csv_header_and_columns(self, client):
        client.query("TRUNCATE TABLE copy_tgt")
        res = client.copy_in(
            "COPY copy_tgt (v, k) FROM STDIN WITH (FORMAT csv, HEADER)",
            b'v,k\n"a,b",10\n,20\n')
        assert res["tags"] == ["COPY 2"]
        got = client.query("SELECT k, v, x FROM copy_tgt ORDER BY k")
        assert got["rows"] == [["10", "a,b", None], ["20", None, None]]

    def test_copy_in_escapes(self, client):
        client.query("TRUNCATE TABLE copy_tgt")
        res = client.copy_in("COPY copy_tgt FROM STDIN",
                             b"1\ta\\tb\\\\N\t\\N\n\\.\n9\tnot-read\t0\n")
        assert res["tags"] == ["COPY 1"]
        got = client.query("SELECT v, x FROM copy_tgt")
        assert got["rows"] == [["a\tb\\N", None]]

    def test_copy_in_binary(self, client):
        from datafusion_postgres_spark.server.copy_data import (
            COPY_BINARY_SIGNATURE)

        client.query("TRUNCATE TABLE copy_tgt")
        payload = COPY_BINARY_SIGNATURE + struct.pack("!ii", 0, 0)
        for k, v, x in [(1, b"one", 1.5), (2, None, 2.5)]:
            payload += struct.pack("!h", 3)
            payload += struct.pack("!ii", 4, k)
            if v is None:
                payload += struct.pack("!i", -1)
            else:
                payload += struct.pack("!i", len(v)) + v
            payload += struct.pack("!i", 8) + struct.pack("!d", x)
        payload += struct.pack("!h", -1)
        res = client.copy_in(
            "COPY copy_tgt FROM STDIN WITH (FORMAT binary)", payload)
        assert res["tags"] == ["COPY 2"], res
        got = client.query("SELECT * FROM copy_tgt ORDER BY k")
        assert got["rows"] == [["1", "one", "1.5"], ["2", None, "2.5"]]

    def test_copy_out_binary_round_trip(self, client):
        from datafusion_postgres_spark.server.copy_data import (
            COPY_BINARY_SIGNATURE, parse_copy_binary)
        from pyspark.sql import types as T

        client.query(  # self-sufficient under -k selection
            "CREATE OR REPLACE TEMPORARY VIEW wnation AS "
            "SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`")
        body = ("COPY (SELECT n_nationkey, n_name FROM wnation "
                "WHERE n_nationkey < 3 ORDER BY 1) TO STDOUT "
                "WITH (FORMAT binary)").encode() + b"\x00"
        client.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        chunks, fmts = [], None
        while True:
            tag, payload = client.read_message()
            if tag == b"H":
                overall, ncols = struct.unpack("!bH", payload[:3])
                fmts = struct.unpack(f"!{ncols}H", payload[3:3 + 2 * ncols])
                assert overall == 1 and fmts == (1, 1)
            elif tag == b"d":
                chunks.append(payload)
            elif tag == b"Z":
                break
        data = b"".join(chunks)
        assert data.startswith(COPY_BINARY_SIGNATURE)
        rows = parse_copy_binary(data, [T.IntegerType(), T.StringType()])
        assert rows == [(0, "NATION_0"), (1, "NATION_1"), (2, "NATION_2")]

    def test_copy_fail_message(self, client):
        client.query("TRUNCATE TABLE copy_tgt")
        res = client.copy_in("COPY copy_tgt FROM STDIN", fail="client bail")
        assert res["errors"] and res["errors"][0][b"C"] == "57014"
        got = client.query("SELECT count(*) FROM copy_tgt")
        assert got["rows"] == [["0"]]

    def test_copy_in_bad_column_count(self, client):
        res = client.copy_in("COPY copy_tgt FROM STDIN", b"1\tonly-two\n")
        assert res["errors"] and res["errors"][0][b"C"] == "22P04"

    def test_copy_in_unknown_table(self, client):
        res = client.query("COPY no_such_tbl FROM STDIN")
        assert res["errors"]


class TestCopyBinaryBounds:
    """parse_copy_binary must surface malformed payloads as CopyDataError
    (the module's typed wire error), never a raw struct.error."""

    def _valid(self):
        import struct

        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.copy_data import (
            COPY_BINARY_SIGNATURE)
        body = COPY_BINARY_SIGNATURE + struct.pack("!ii", 0, 0)
        body += struct.pack("!h", 2)                       # one row, 2 cols
        body += struct.pack("!i", 4) + struct.pack("!i", 7)
        body += struct.pack("!i", 2) + b"ok"
        body += struct.pack("!h", -1)                      # trailer
        return body, [T.IntegerType(), T.StringType()]

    def test_valid_round_trip(self):
        from datafusion_postgres_spark.server.copy_data import (
            parse_copy_binary)
        data, dts = self._valid()
        assert parse_copy_binary(data, dts) == [(7, "ok")]

    @pytest.mark.parametrize("cut", [1, 3, 5, 7, 9])
    def test_truncated_raises_typed_error(self, cut):
        from datafusion_postgres_spark.server.copy_data import (
            CopyDataError, parse_copy_binary)
        data, dts = self._valid()
        trunc = data[:len(data) - 4 - cut]    # drop trailer + cut bytes
        try:
            parse_copy_binary(trunc, dts)
        except CopyDataError:
            pass  # the typed error — correct
        # silent short-parse of a fully-formed prefix is also acceptable;
        # struct.error propagating is NOT
        except Exception as exc:  # pragma: no cover
            pytest.fail(f"untyped error leaked: {type(exc).__name__}: {exc}")

    def test_negative_field_length_rejected(self):
        import struct

        from pyspark.sql import types as T

        from datafusion_postgres_spark.server.copy_data import (
            COPY_BINARY_SIGNATURE, CopyDataError, parse_copy_binary)
        body = COPY_BINARY_SIGNATURE + struct.pack("!ii", 0, 0)
        body += struct.pack("!h", 1) + struct.pack("!i", -7)
        with pytest.raises(CopyDataError):
            parse_copy_binary(body, [T.IntegerType()])
