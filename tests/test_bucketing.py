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
