"""PG JSON function family. The reference marks these out of scope
("DataFusion lacks the type", functions.md JSON section); Spark's JSON
expressions make them expressible — JSON rides as STRING, matching the
->/->>/#> operator rewrites. Expected values match PostgreSQL's
documented json function semantics."""


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


class TestJsonScalars:
    def test_json_typeof(self, spark):
        assert one(spark, "json_typeof('{\"a\":1}')") == "object"
        assert one(spark, "json_typeof('[1]')") == "array"
        assert one(spark, "json_typeof('\"x\"')") == "string"
        assert one(spark, "json_typeof('1.5')") == "number"
        assert one(spark, "json_typeof('null')") == "null"
        assert one(spark, "jsonb_typeof('true')") == "boolean"

    def test_extract_path(self, spark):
        j = "'{\"a\":{\"b\":[10,20]}}'"
        assert one(spark, f"json_extract_path({j}, 'a', 'b', '1')") == "20"
        assert one(spark, "jsonb_extract_path_text('{\"a\":\"x\"}', 'a')") \
            == "x"

    def test_array_length_keys(self, spark):
        assert one(spark, "jsonb_array_length('[1,2,3]')") == 3
        assert one(spark, "jsonb_object_keys('{\"a\":1,\"b\":2}')") == \
            ["a", "b"]

    def test_strip_nulls(self, spark):
        assert one(spark,
                   "json_strip_nulls('{\"a\":1,\"b\":null,\"c\":"
                   "{\"d\":null}}')") == '{"a":1,"c":{}}'

    def test_jsonb_pretty(self, spark):
        assert one(spark, "jsonb_pretty('{\"a\":1}')") == '{\n    "a": 1\n}'

    def test_array_elements(self, spark):
        rows = spark.sql(
            "SELECT * FROM json_array_elements('[1, {\"a\":2}, \"x\"]')"
        ).collect()
        assert [r.value for r in rows] == ["1", '{"a":2}', "x"]


class TestJsonBuilders:
    """Dialect-rewritten constructors (engine fixture)."""

    def test_build_array_heterogeneous(self, engine):
        r = engine.execute(
            "SELECT json_build_array(1, 'y', NULL, 2.5) AS a")[0]
        assert list(r.rows())[0][0] == '[1,"y",null,2.5]'

    def test_build_array_empty(self, engine):
        r = engine.execute("SELECT json_build_array() AS a")[0]
        assert list(r.rows())[0][0] == "[]"

    def test_build_object_nulls_kept(self, engine):
        r = engine.execute(
            "SELECT json_build_object('a', 1, 'b', NULL) AS o")[0]
        assert list(r.rows())[0][0] == '{"a":1,"b":null}'

    def test_nested_builders(self, engine):
        r = engine.execute(
            "SELECT json_build_array(json_build_object('k', 'v'), 1) AS n"
        )[0]
        assert list(r.rows())[0][0] == '[{"k":"v"},1]'
        r = engine.execute(
            "SELECT json_build_object('o', json_build_array(1, 2)) AS n")[0]
        assert list(r.rows())[0][0] == '{"o":[1,2]}'

    def test_json_agg(self, engine):
        r = engine.execute(
            "SELECT json_agg(x) AS a FROM (VALUES (1), (2), (3)) t(x)")[0]
        assert list(r.rows())[0][0] == "[1,2,3]"

    def test_json_agg_of_objects(self, engine):
        r = engine.execute(
            "SELECT json_agg(json_build_object('k', x)) AS a "
            "FROM (VALUES (1), (2)) t(x)")[0]
        assert list(r.rows())[0][0] == '[{"k":1},{"k":2}]'

    def test_json_object_agg(self, engine):
        r = engine.execute(
            "SELECT json_object_agg(k, v) AS m "
            "FROM (VALUES ('a', 1), ('b', 2)) t(k, v)")[0]
        assert list(r.rows())[0][0] == '{"a":1,"b":2}'

    def test_row_to_json(self, engine):
        r = engine.execute(
            "SELECT row_to_json(struct(1 AS a, 'x' AS b)) AS j")[0]
        assert list(r.rows())[0][0] == '{"a":1,"b":"x"}'

    def test_json_operators_still_work(self, engine):
        r = engine.execute(
            "SELECT '{\"a\":{\"b\":2}}'::jsonb -> 'a' AS x, "
            "'{\"a\":1}'::json ->> 'a' AS y")[0]
        assert list(r.rows())[0] == ('{"b":2}', "1")


class TestJsonbModify:
    def test_jsonb_set(self, spark):
        assert one(spark, "jsonb_set('{\"a\":{\"b\":1}}', "
                          "array('a','b'), '9')") == '{"a":{"b":9}}'
        assert one(spark, "jsonb_set('[0,1,2]', array('1'), '\"x\"')") == \
            '[0,"x",2]'

    def test_jsonb_set_create_missing(self, spark):
        assert one(spark, "jsonb_set('{\"a\":1}', array('c'), '2')") == \
            '{"a":1,"c":2}'
        assert one(spark, "jsonb_set('{\"a\":1}', array('c'), '2', "
                          "false)") == '{"a":1}'

    def test_jsonb_insert(self, spark):
        assert one(spark, "jsonb_insert('[0,1,2]', array('1'), '\"x\"')") \
            == '[0,"x",1,2]'
        assert one(spark, "jsonb_insert('[0,1,2]', array('1'), '\"x\"', "
                          "true)") == '[0,1,"x",2]'
        # existing object key: PG raises; NULL is the error channel here
        assert one(spark, "jsonb_insert('{\"a\":1}', array('a'), '2')") \
            is None

    def test_json_each(self, spark):
        rows = spark.sql(
            "SELECT * FROM json_each('{\"a\":1,\"b\":\"x\"}') "
            "ORDER BY key").collect()
        assert [(r.key, r.value) for r in rows] == [("a", "1"), ("b", "x")]


class TestJsonpathFilters:
    """Round 4: filter expressions (? (@ > 2)) and predicate paths behind
    the simple-path parser (functions/jsonpath.py); simple paths stay on
    the get_json_object codegen fast path."""

    def test_evaluator_unit(self):
        from datafusion_postgres_spark.functions import jsonpath as J

        assert J.query('{"a":[1,2,3,4]}', '$.a[*] ? (@ > 2)') == [3, 4]
        assert J.query('{"t":[{"x":1},{"x":5}]}',
                       '$.t[*] ? (@.x >= 5)') == [{"x": 5}]
        assert J.query('{"a":3}', '$.a > 2') == [True]
        assert J.query('{"a":[1,"two"]}', '$.a[*] ? (@ == "two")') == \
            ["two"]
        assert J.query('{"a":[{"b":1},{"b":2}]}',
                       '$.a ? (@.b == 1 || @.b == 2)') == \
            [{"b": 1}, {"b": 2}]
        # lax-mode auto-unwrap on member access
        assert J.query('{"a":[{"b":1},{"b":2}]}', '$.a.b') == [1, 2]
        # invalid path / invalid json -> NULL-quiet
        assert J.query('{"a":1}', 'nonsense') is None
        assert J.query('not json', '$.a') is None
        assert J.match_bool('{"a":1}', '$.a') is None  # not a boolean

    def test_filter_via_sql_udfs(self, spark):
        row = spark.sql(
            "SELECT jsonb_path_query_first("
            "'{\"items\":[{\"p\":5},{\"p\":15}]}', "
            "'$.items[*] ? (@.p > 10)') AS a, "
            "jsonb_path_exists('{\"a\":[1,2]}', '$.a[*] ? (@ > 5)') AS b, "
            "jsonb_path_match('{\"a\":3}', '$.a > 2') AS c").collect()[0]
        assert row.a == '{"p":15}'
        assert row.b is False and row.c is True

    def test_like_regex_and_starts_with_unit(self):
        from datafusion_postgres_spark.functions import jsonpath as J

        doc = ('{"items":[{"name":"alpha","v":1},{"name":"Beta","v":5},'
               '{"name":"gamma","v":9}]}')
        assert J.query(doc, '$.items[*] ? (@.name like_regex "^a")') == \
            [{"name": "alpha", "v": 1}]
        # flag "i": case-insensitive
        assert J.query(doc, '$.items[*] ? (@.name like_regex "^b" '
                            'flag "i")') == [{"name": "Beta", "v": 5}]
        # partial match (PG ~ semantics), not anchored
        assert J.query(doc, '$.items[*].name ? (@ like_regex "ta$")') == \
            ["Beta"]
        assert J.query(doc, '$.items[*] ? (@.name starts with "ga")') == \
            [{"name": "gamma", "v": 9}]
        # predicate forms
        assert J.query('{"a":"hello"}', '$.a like_regex "ell"') == [True]
        assert J.query('{"a":"hello"}', '$.a starts with "he"') == [True]
        assert J.query('{"a":"hello"}', '$.a starts with "x"') == [False]
        # non-strings never match
        assert J.query('{"a":[1,2]}', '$.a[*] ? (@ like_regex ".")') == []

    def test_like_regex_via_sql_udfs(self, spark):
        row = spark.sql(
            "SELECT jsonb_path_exists("
            "'{\"tags\":[\"prod\",\"staging\"]}', "
            "'$.tags[*] ? (@ like_regex \"^pr\")') AS a, "
            "jsonb_path_query_first("
            "'{\"users\":[{\"n\":\"bob\"},{\"n\":\"alice\"}]}', "
            "'$.users[*] ? (@.n starts with \"al\")') AS b, "
            "jsonb_path_match('{\"a\":\"xyz\"}', "
            "'$.a like_regex \"y\"') AS c").collect()[0]
        assert row.a is True
        assert row.b == '{"n":"alice"}'
        assert row.c is True

    def test_simple_paths_unchanged(self, spark):
        row = spark.sql(
            "SELECT jsonb_path_query_first('{\"a\":{\"b\":7}}', '$.a.b') "
            "AS a, jsonb_path_exists('{\"a\":1}', '$.missing') AS b"
        ).collect()[0]
        assert row.a == "7" and row.b is False

    def test_query_array(self, spark):
        row = spark.sql(
            "SELECT jsonb_path_query_array('{\"a\":[1,2,3,4]}', "
            "'$.a[*] ? (@ > 2)') AS f, "
            "jsonb_path_query_array('{\"a\":[1,2]}', '$.a[*]') AS all_, "
            "jsonb_path_query_array('{\"a\":1}', '$.missing') AS none_"
        ).collect()[0]
        assert row.f == "[3,4]" and row.all_ == "[1,2]" and \
            row.none_ == "[]"

    def test_at_question_operator_with_filter(self, engine):
        r = engine.execute(
            "SELECT '{\"a\":[1,2,3]}' @? '$.a[*] ? (@ > 2)' AS hit, "
            "'{\"a\":[1,2,3]}' @? '$.a[*] ? (@ > 9)' AS miss")[0]
        assert list(r.rows())[0] == (True, False)


class TestJsonpathFastPredicate:
    """Round 5: the single-predicate filter shape rides a pure-codegen
    variant expression — no Arrow/Python hop (verdict item: widen the
    jsonpath fast path for ORM-generated introspection)."""

    def test_values_match_evaluator(self, spark):
        from datafusion_postgres_spark.functions import jsonpath as J
        j = '{"a":[{"b":1,"c":"x"},{"b":3,"c":"y"},{"b":5,"c":"z"}]}'
        cases = ['$.a[*] ? (@.b > 2).c', '$.a[*] ? (@.b <= 1)',
                 '$.a[*] ? (@.c == "y").b', '$.a[*] ? (@.b >= 9).c',
                 '$.a ? (@.b != 3).c']
        for p in cases:
            got = spark.sql(
                f"""SELECT jsonb_path_query_first('{j}', '{p}') AS r,
                           jsonb_path_exists('{j}', '{p}') AS e"""
            ).collect()[0]
            assert got["r"] == J.query_first(j, p), p
            assert got["e"] == J.exists_any(j, p), p

    def test_fast_shape_has_no_python_eval(self, spark):
        # the route decision happens at TRANSPILE time (dialect rule
        # route_jsonpath_literals): a Pandas UDF anywhere in a SQL UDF
        # body blocks literal inlining, so the generic jsonb_path_*
        # dispatch can never reach codegen — the PG-client path routes
        # around it on literal paths
        from datafusion_postgres_spark.dialect.transpiler import (
            PostgresTranspiler)
        from datafusion_postgres_spark.plans import inspect as P
        tp = PostgresTranspiler()
        sql = tp.transpile(
            "SELECT jsonb_path_query_first(j, '$.items[*] ? (@.p > 10).n')"
            " AS r FROM VALUES ('{\"items\":[{\"p\":15,\"n\":\"a\"}]}') t(j)")
        df = spark.sql(sql)
        plan = P.formatted_plan(df)
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert df.collect()[0]["r"] == "a"

    def test_plain_path_has_no_python_eval(self, spark):
        from datafusion_postgres_spark.dialect.transpiler import (
            PostgresTranspiler)
        from datafusion_postgres_spark.plans import inspect as P
        tp = PostgresTranspiler()
        sql = tp.transpile(
            "SELECT jsonb_path_query_first(j, '$.a.b') AS r, "
            "jsonb_path_exists(j, '$.a') AS e, "
            "jsonb_path_match(j, '$.ok') AS m "
            "FROM VALUES ('{\"a\":{\"b\":7},\"ok\":true}') t(j)")
        df = spark.sql(sql)
        plan = P.formatted_plan(df)
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        row = df.collect()[0]
        assert row["r"] == "7" and row["e"] is True and row["m"] is True

    def test_transpiler_routing_decisions(self):
        from datafusion_postgres_spark.dialect.transpiler import (
            PostgresTranspiler)
        tp = PostgresTranspiler()
        out = tp.transpile(
            "SELECT jsonb_path_query_first(j, '$.a.b'), "
            "jsonb_path_exists(j, '$.a[*] ? (@.p > 1)'), "
            "jsonb_path_query_first(j, '$.a ? (@.x == 1 && @.y == 2)'), "
            "jsonb_path_query_first(j, p) FROM t")
        assert "pg_jsonpath_plain_first(j, '$.a.b')" in out
        assert "pg_jsonpath_pred_exists" in out
        assert "pg_jsonpath_filter_first" in out          # complex literal
        assert "jsonb_path_query_first(j, p)" in out      # non-literal kept
        # the qualifier strip runs before routing, so qualified calls
        # route too; a computed (non-literal) path stays on the generic
        # dispatch
        out2 = tp.transpile(
            "SELECT pg_catalog.jsonb_path_exists(j, '$.a'), "
            "jsonb_path_exists(j, '$.a' || x) FROM t")
        assert "pg_jsonpath_plain_exists(j, '$.a')" in out2
        assert "jsonb_path_exists(j, '$.a' || x)" in out2

    def test_complex_shapes_still_route_to_evaluator(self, spark):
        # multi-clause predicates remain correct (Python evaluator path)
        row = spark.sql(
            "SELECT jsonb_path_query_first("
            "'{\"a\":[{\"b\":1},{\"b\":2}]}', "
            "'$.a ? (@.b == 1 || @.b == 2)') AS r").collect()[0]
        assert row["r"] == '{"b":1}'

    def test_malformed_json_null_quiet(self, spark):
        row = spark.sql(
            "SELECT jsonb_path_query_first('not json', "
            "'$.a[*] ? (@.b > 1).c') AS r, "
            "jsonb_path_exists('not json', '$.a[*] ? (@.b > 1)') AS e"
        ).collect()[0]
        assert row["r"] is None
        assert row["e"] in (None, False)  # PG: silent false in lax mode
