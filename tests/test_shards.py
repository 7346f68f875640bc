"""Training-shard export sink tests."""


class TestTrainingShards:
    def test_write_and_manifest(self, spark, tmp_path_factory):
        from datafusion_postgres_spark.sources.shards import (
            write_training_shards)
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        out = str(tmp_path_factory.mktemp("shards") / "corpus")
        manifest = write_training_shards(docs, out, seed=3, n_shards=4)
        rows = manifest.collect()
        assert [r["shard"] for r in rows] == [0, 1, 2, 3]
        assert sum(r["n_docs"] for r in rows) == docs.count()
        assert all(r["n_tokens"] > 0 for r in rows)
        # per-doc token counts are persisted with the payload: the
        # manifest pass prunes down to (shard, n_tok) — no second
        # tokenization — and training loaders pack sequences from it
        written = spark.read.parquet(out)
        assert "n_tok" in written.columns
        total = written.agg({"n_tok": "sum"}).collect()[0][0]
        assert total == sum(r["n_tokens"] for r in rows)

    def test_order_is_seed_deterministic(self, spark, tmp_path_factory):
        from datafusion_postgres_spark.sources.shards import (
            write_training_shards)
        from datafusion_postgres_spark.operators.text import shuffle_sharded
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(200)
        base = tmp_path_factory.mktemp("shards_det")
        write_training_shards(docs, str(base / "a"), seed=7, n_shards=2)
        write_training_shards(docs, str(base / "b"), seed=7, n_shards=2)
        a = spark.read.parquet(str(base / "a")).select(
            "shard", "pos", "doc_id").collect()
        b = spark.read.parquet(str(base / "b")).select(
            "shard", "pos", "doc_id").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # and the layout IS the epoch order of shuffle_sharded
        expect = {(r["shard"], r["pos"]): r["doc_id"] for r in
                  shuffle_sharded(docs, seed=7, n_shards=2).collect()}
        got = {(r["shard"], r["pos"]): r["doc_id"] for r in a}
        assert got == expect

    def test_max_records_splits_files(self, spark, tmp_path_factory):
        import glob
        from datafusion_postgres_spark.sources.shards import (
            write_training_shards)
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(100)
        out = str(tmp_path_factory.mktemp("shards_split") / "c")
        write_training_shards(docs, out, seed=1, n_shards=2,
                              max_records_per_file=10)
        files = glob.glob(f"{out}/shard=*/part-*.parquet")
        assert len(files) >= 10  # ~100 rows / 10 per file

    def test_resume_reader_prunes_and_orders(self, spark, tmp_path_factory):
        from datafusion_postgres_spark.sources.shards import (
            write_training_shards, read_training_shards)
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(120)
        out = str(tmp_path_factory.mktemp("shards_resume") / "c")
        write_training_shards(docs, out, seed=5, n_shards=3)
        full = spark.read.parquet(out)
        n2 = full.where("shard = 2").count()
        half = full.where("shard = 1 AND pos >= 10").count()
        resumed = read_training_shards(spark, out, from_shard=1,
                                       from_pos=10)
        assert resumed.count() == n2 + half
        # partition pruning: shard=0 directory is excluded at plan time
        plan = resumed._jdf.queryExecution().executedPlan().toString()
        assert "shard=0" not in plan


class TestZorderLayout:
    """write_zordered: files carry narrow min/max footer ranges on BOTH
    clustered columns at once — the stats-pruning claim, pinned by
    reading the written parquet footers."""

    def _spans(self, path, cols):
        import glob

        import pyarrow.parquet as pq
        spans = {c: [] for c in cols}
        glob_min = {c: None for c in cols}
        glob_max = {c: None for c in cols}
        per_file = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.read_metadata(f)
            fmin = {c: None for c in cols}
            fmax = {c: None for c in cols}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for i in range(g.num_columns):
                    col = g.column(i)
                    name = col.path_in_schema
                    if name in cols and col.statistics is not None:
                        s = col.statistics
                        if fmin[name] is None or s.min < fmin[name]:
                            fmin[name] = s.min
                        if fmax[name] is None or s.max > fmax[name]:
                            fmax[name] = s.max
            per_file.append((fmin, fmax))
            for c in cols:
                if fmin[c] is None:
                    continue
                if glob_min[c] is None or fmin[c] < glob_min[c]:
                    glob_min[c] = fmin[c]
                if glob_max[c] is None or fmax[c] > glob_max[c]:
                    glob_max[c] = fmax[c]
        for fmin, fmax in per_file:
            for c in cols:
                tot = glob_max[c] - glob_min[c]
                spans[c].append((fmax[c] - fmin[c]) / tot if tot else 0.0)
        return {c: sum(v) / len(v) for c, v in spans.items()}

    def _corpus(self, spark):
        # two INDEPENDENT uniform dimensions: insertion order correlates
        # with neither, so a plain multi-file write has ~full-span
        # footers on both
        return spark.range(40_000).selectExpr(
            "id",
            "CAST((id * 40503 % 65537) AS DOUBLE) AS x",
            "CAST((id * 48271 % 65521) AS DOUBLE) AS y")

    def test_round_trip_and_narrow_spans(self, spark, tmp_path):
        from datafusion_postgres_spark.sources.sinks import write_zordered
        df = self._corpus(spark)
        zp, pp = str(tmp_path / "z"), str(tmp_path / "plain")
        write_zordered(df, zp, ["x", "y"], n_files=16)
        df.repartition(16).write.mode("overwrite").parquet(pp)
        back = spark.read.parquet(zp)
        assert back.count() == 40_000
        assert set(back.columns) == {"id", "x", "y"}
        assert back.agg({"x": "sum"}).collect()[0][0] == \
            df.agg({"x": "sum"}).collect()[0][0]
        z_spans = self._spans(zp, ["x", "y"])
        p_spans = self._spans(pp, ["x", "y"])
        # z-layout: BOTH dims narrow per file; plain round-robin: both
        # dims ~full span in every file
        assert z_spans["x"] < 0.6 and z_spans["y"] < 0.6, z_spans
        assert p_spans["x"] > 0.9 and p_spans["y"] > 0.9, p_spans

    def test_rejects_strings_and_single_col(self, spark):
        from datafusion_postgres_spark.sources.sinks import zorder_value
        df = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s",
                                        "CAST(id AS DOUBLE) AS x")
        import pytest as _pt
        with _pt.raises(ValueError):
            zorder_value(df, ["x"])
        with _pt.raises(ValueError):
            zorder_value(df, ["s", "x"])
        with _pt.raises(ValueError):
            zorder_value(df, ["id", "x"], bits=32)


def test_zorder_empty_input_clear_error(spark):
    """Round-7 ADVICE fix: empty input raises a clear ValueError, not a
    bare TypeError from None-None arithmetic."""
    import pytest
    from datafusion_postgres_spark.sources.sinks import zorder_value
    df = spark.range(0).selectExpr("CAST(id AS DOUBLE) AS x",
                                   "CAST(id AS DOUBLE) AS y")
    with pytest.raises(ValueError, match="empty input"):
        zorder_value(df, ["x", "y"])
