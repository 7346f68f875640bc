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
