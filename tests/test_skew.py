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


def test_degenerate_lsh_bucket_is_bounded(spark):
    """N identical documents put EVERY id in one LSH bucket per band — the
    documented degenerate case (operators/dedup.py).  The bucket cap must
    (a) bound the in-task pair materialization to O(n) star pairs instead
    of O(n²) combinations, (b) still drop every non-keeper id in
    drop_near_duplicates (star pairs all verify at Jaccard 1), and (c) keep
    the job a success, not an OOM-shaped failure mode hidden in a
    docstring."""
    from pdf_to_epub_spark.operators.dedup import (
        drop_near_duplicates,
        minhash_candidate_pairs,
    )

    n = 400
    rows = [
        {"doc_id": i, "text": "the same exact document body repeated verbatim"}
        for i in range(n)
    ]
    df = spark.createDataFrame(rows)

    # cap far below the bucket size → star fallback engages
    pairs = minhash_candidate_pairs(
        df, k=3, num_hashes=16, bands=4, jaccard_threshold=0.9, max_bucket=50
    )
    got = sorted(map(tuple, pairs.select("id_a", "id_b").collect()))
    # star shape: every pair anchored at the bucket-minimum id, linear count
    assert got == [(0, i) for i in range(1, n)]

    kept = drop_near_duplicates(
        df, k=3, num_hashes=16, bands=4, jaccard_threshold=0.9, max_bucket=50
    )
    assert [r["doc_id"] for r in kept.collect()] == [0]

    # below the cap the full combination set is still emitted (LSH contract)
    small = spark.createDataFrame(rows[:5])
    allpairs = minhash_candidate_pairs(
        small, k=3, num_hashes=16, bands=4, jaccard_threshold=0.9, max_bucket=50
    )
    assert allpairs.count() == 5 * 4 // 2


def test_degenerate_embedding_bucket_is_bounded(spark):
    """Same degeneracy for the embedding LSH path: identical vectors share
    every hyperplane bucket; the cap bounds pair generation and the
    keep-lowest removal survivor set is unchanged."""
    from pdf_to_epub_spark.operators.similarity import embedding_near_duplicates

    n = 300
    vec = [float(x) for x in range(8)]
    rows = [{"vec_id": i, "embedding": vec} for i in range(n)]
    df = spark.createDataFrame(rows)
    pairs = embedding_near_duplicates(
        df, dim=8, threshold=0.99, bits=6, max_bucket=40
    )
    got = sorted(map(tuple, pairs.select("id_a", "id_b").collect()))
    assert got == [(0, i) for i in range(1, n)]
