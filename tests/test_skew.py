"""Skew handling: url-hash salting balances a pathologically skewed scan.

The WARC-capture skew story (north_rule): crawl files arrive clustered by
capture order, so a naive scan gives some tasks all the giant documents.
``extract_documents(salt_partitions=N)`` repartitions by xxhash64(url)
BEFORE the CPU-heavy stage; this test builds a corpus where all big docs
are clustered in one input partition and asserts salting spreads them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_epub_spark.sources.synth import make_documents


def test_salting_balances_clustered_giants(spark):
    rows = make_documents(600, seed=31)
    # simulate capture clustering: the first 150 docs are 10× longer
    for r in rows[:150]:
        r["text"] = r["text"] * 10
    df = spark.createDataFrame(rows).repartitionByRange(4, "url")

    def partition_char_loads(frame) -> list[int]:
        per = (
            frame.select(
                F.spark_partition_id().alias("pid"), F.length("text").alias("n")
            )
            .groupBy("pid")
            .agg(F.sum("n").alias("chars"))
            .collect()
        )
        return sorted(r["chars"] for r in per)

    salted = df.repartition(8, F.xxhash64("url"))
    loads = partition_char_loads(salted)
    # after salting, the heaviest partition carries < 2.5× the lightest
    assert loads[-1] < 2.5 * loads[0], loads

    # control: range-partitioned input is badly skewed (clustered giants)
    unbalanced = partition_char_loads(df)
    assert unbalanced[-1] > 5 * unbalanced[0], unbalanced
