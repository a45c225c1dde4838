"""Bucketed layout: the co-located join must compile WITHOUT a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators.bucketing import (
    bucketed_join,
    iceberg_available,
    plan_has_exchange,
    write_bucketed,
)
from pdf_to_epub_spark.sources.synth import make_documents


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in ./spark-warehouse (gitignored); dropped below
    docs = spark.createDataFrame(make_documents(200, seed=21)).select(
        "url", "lang", F.length("text").alias("n_chars")
    )
    derived = docs.select("url", (F.col("n_chars") * 2).alias("double_chars"))
    write_bucketed(docs, "docs_bucketed", "url", 8)
    write_bucketed(derived, "derived_bucketed", "url", 8)
    yield "docs_bucketed", "derived_bucketed"
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS derived_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path (the broadcast path trivially avoids the
    # shuffle; bucketing is about the case where NEITHER side fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, on="url")
        joined.collect()  # finalize AQE plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert not plan_has_exchange(joined), "bucketed join must not shuffle"
        assert joined.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on genuinely unbucketed inputs shuffles."""
    a = spark.createDataFrame(make_documents(200, seed=21)).select(
        "url", F.length("text").alias("n_chars")
    )
    b = a.select("url", (F.col("n_chars") * 3).alias("x"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, on="url")
        joined.collect()
        assert plan_has_exchange(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("url").agg(F.sum("n_chars").alias("s"))
    agg.collect()
    assert not plan_has_exchange(agg), "groupBy on the bucket key must not shuffle"


def test_iceberg_probe(spark):
    # This image has no Iceberg runtime jar; the probe must say so cleanly.
    assert iceberg_available(spark) is False


class _FakeWriterV2:
    """Stand-in for the DataSourceV2 writer a real Iceberg catalog returns:
    records the exact call chain DEPLOYMENT.md §Iceberg prescribes and
    executes the parquet equivalent so the downstream flow keeps running.
    Lets the recipe be exercised end-to-end without the runtime jar."""

    calls: list[dict] = []

    def __init__(self, df, table):
        self.df, self.table = df, table
        self.log = {"table": table}

    def using(self, fmt):
        self.log["using"] = fmt
        return self

    def partitionedBy(self, *cols):
        self.log["partitionedBy"] = [str(c) for c in cols]
        return self

    def createOrReplace(self):
        self.log["action"] = "createOrReplace"
        _FakeWriterV2.calls.append(self.log)
        self.df.write.mode("overwrite").format("parquet").saveAsTable(self.table)

    def append(self):
        self.log["action"] = "append"
        _FakeWriterV2.calls.append(self.log)
        self.df.write.mode("append").format("parquet").saveAsTable(self.table)


def test_iceberg_recipe_contract_with_mocked_catalog(spark, monkeypatch):
    """Dry-wires DEPLOYMENT.md §Iceberg through the iceberg_available()
    switch: with the probe forced on and writeTo mocked to a recording
    writer, the write path must issue exactly the recipe's V2 chain
    (using iceberg, partitionedBy days(warc_ts) + bucket(N, url), snapshot
    append) and the resume loop must skip committed work on the second
    run.  Green here means the recipe is executable the day a runtime jar
    exists — only the writer object changes."""
    from pdf_to_epub_spark.operators import bucketing
    from pdf_to_epub_spark.operators.resume import pending_documents, with_doc_hash

    monkeypatch.setattr(bucketing, "iceberg_available", lambda _s: True)
    pages = spark.createDataFrame(make_documents(30, seed=4))
    # patch the concrete class (pyspark.sql.DataFrame is a facade in 4.x)
    monkeypatch.setattr(
        type(pages), "writeTo", lambda self, t: _FakeWriterV2(self, t)
    )
    _FakeWriterV2.calls = []
    try:
        bucketing.write_pages_table(spark, pages, "pages_ct", n_buckets=8)
        create = _FakeWriterV2.calls[-1]
        assert create["using"] == "iceberg"
        assert create["action"] == "createOrReplace"
        assert any("days(warc_ts)" in c for c in create["partitionedBy"])
        assert any("bucket(8, url)" in c for c in create["partitionedBy"])

        # run 1: nothing committed yet -> everything pending; commit 20
        docs = with_doc_hash(spark.table("pages_ct"), payload_col="text")
        done = bucketing.committed_hashes(spark, "pages_done_ct")
        assert done.count() == 0
        pending = pending_documents(docs, done)
        assert pending.count() == 30
        bucketing.append_run(
            spark, pending.limit(20).select("url", "doc_hash"), "pages_done_ct"
        )
        assert _FakeWriterV2.calls[-1]["action"] == "append"

        # run 2: resume skips the 20 committed docs
        done2 = bucketing.committed_hashes(spark, "pages_done_ct")
        assert done2.count() == 20
        assert pending_documents(docs, done2).count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_ct")
        spark.sql("DROP TABLE IF EXISTS pages_done_ct")


def test_url_bucketed_parquet_layout(spark, tmp_path):
    """`write_parquet(bucket_by_url=True)` — the pyarrow emulation of the
    Iceberg bucket(N, url) layout the bench extraction path reads — must
    hold the SAME row multiset as the chunked writer, with per-file url
    sets that are disjoint and consistent with `url_bucket`."""
    import pyarrow.parquet as pq

    from pdf_to_epub_spark.sources.synth import url_bucket, write_parquet

    chunked, bucketed = tmp_path / "chunked", tmp_path / "bucketed"
    write_parquet(str(chunked), 120, seed=31, n_files=8)
    write_parquet(str(bucketed), 120, seed=31, n_files=8, bucket_by_url=True)

    a = spark.read.parquet(str(chunked))
    b = spark.read.parquet(str(bucketed))
    assert a.count() == b.count() == 120
    # identical row multiset (urls are unique keys in the synth corpus)
    assert a.join(b, ["url", "text"]).count() == 120

    # every file holds exactly its url_bucket slice — disjoint by
    # construction, so a reader may treat file == bucket
    for f in sorted(bucketed.iterdir()):
        idx = int(f.name.split("-")[1].split(".")[0])
        urls = pq.read_table(f, columns=["url"]).column("url").to_pylist()
        assert urls, f.name
        assert {url_bucket(u, 8) for u in urls} == {idx}
