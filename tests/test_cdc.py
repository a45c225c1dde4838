"""Content-defined chunking tests (operators/cdc.py): vector==reference
equality, boundary-resync after edits, size bounds, Spark dedup table."""

from __future__ import annotations

import hashlib
import pathlib
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.operators.cdc import (  # noqa: E402
    _np_boundaries,
    cdc_boundaries,
    cdc_chunks,
    cdc_dedup_ratio,
    chunk_bytes,
    chunk_dedup_table,
)


def test_vectorized_equals_reference_loop():
    rng = random.Random(7)
    for _ in range(25):
        n = rng.randrange(1, 5000)
        data = bytes(rng.randrange(256) for _ in range(n))
        assert cdc_boundaries(data) == _np_boundaries(
            np.frombuffer(data, dtype=np.uint8), 64, 8, 1024
        )


def test_boundaries_cover_and_respect_size_bounds():
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(20000))
    cuts = cdc_boundaries(data, min_size=64, avg_bits=6, max_size=512)
    assert cuts[-1] == len(data)
    sizes = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(64 <= s <= 512 for s in sizes[:-1])
    assert sizes[-1] <= 512


def test_edit_resync_preserves_most_chunks():
    rng = random.Random(3)
    base = bytes(rng.randrange(256) for _ in range(6000))
    edited = b"PREPENDED EDIT " + base[:3000] + b"XYZ" + base[3000:]
    c1 = [hashlib.md5(c).hexdigest() for c in chunk_bytes(base)]
    c2 = set(hashlib.md5(c).hexdigest() for c in chunk_bytes(edited))
    shared = sum(1 for h in c1 if h in c2)
    # two local edits may each perturb a couple of chunks; the rest resync
    assert shared >= len(c1) - 5
    assert shared > len(c1) * 0.7


def test_param_validation():
    with pytest.raises(ValueError, match="min_size"):
        cdc_boundaries(b"x" * 200, min_size=32)
    with pytest.raises(ValueError, match="max_size"):
        cdc_boundaries(b"x" * 200, min_size=64, max_size=64)


def test_spark_chunks_and_dedup_table(spark):
    shared = "the quick brown fox " * 40  # 800 bytes, shared across docs
    rows = [
        (0, shared + "tail-a " * 30),
        (1, shared + "tail-b " * 30),
        (2, None),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = cdc_chunks(df)
    got = chunks.collect()
    # null/empty docs contribute no rows
    assert {r["doc_id"] for r in got} == {0, 1}
    # per-doc chunks tile the byte length in order
    for i in (0, 1):
        mine = sorted(
            (r for r in got if r["doc_id"] == i), key=lambda r: r["chunk_idx"]
        )
        assert sum(r["chunk_bytes"] for r in mine) == len(rows[i][1].encode())
        assert [r["chunk_idx"] for r in mine] == list(range(len(mine)))
        # matches the pure reference
        ref = [hashlib.md5(c).hexdigest() for c in chunk_bytes(rows[i][1].encode())]
        assert [r["chunk_hash"] for r in mine] == ref
    table = chunk_dedup_table(chunks)
    assert table.filter("n_copies > 1").count() >= 1  # the shared prefix dedups
    ratio = cdc_dedup_ratio(chunks).collect()[0]
    assert ratio["logical_bytes"] > ratio["stored_bytes"]
    assert ratio["dedup_ratio"] > 1.0


def test_cdc_incremental_matches_full_rechunk(spark):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.cdc import cdc_chunks, cdc_incremental

    base = "the quick brown fox jumps over the lazy dog " * 30
    old_rows = [(i, base + f"old tail {i} " * 10) for i in range(12)]
    # new snapshot: 0..3 unchanged, 4..7 edited, 8..9 deleted, 20..21 added
    new_rows = (
        [(i, old_rows[i][1]) for i in range(4)]
        + [(i, "EDIT " + old_rows[i][1]) for i in range(4, 8)]
        + [(i, old_rows[i][1]) for i in range(10, 12)]
        + [(20, base + "brand new A " * 10), (21, base + "brand new B " * 10)]
    )
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    old_chunks = cdc_chunks(old)
    batch = new.where((F.col("doc_id") >= 4) & (F.col("doc_id") <= 7) | (F.col("doc_id") >= 20))
    deleted = spark.createDataFrame([(8,), (9,)], "doc_id long")
    delta = {
        r["chunk_hash"]: r["ref_delta"]
        for r in cdc_incremental(old_chunks, batch, deleted).collect()
    }
    # old store refcounts + delta == full re-chunk of the new corpus
    old_refs = {
        r["chunk_hash"]: r["count"]
        for r in old_chunks.groupBy("chunk_hash").count().collect()
    }
    want = {
        r["chunk_hash"]: r["count"]
        for r in cdc_chunks(new).groupBy("chunk_hash").count().collect()
    }
    applied = dict(old_refs)
    for h, d in delta.items():
        applied[h] = applied.get(h, 0) + d
    applied = {h: c for h, c in applied.items() if c != 0}
    assert applied == want
    # the delta only references touched docs' chunks: every -1 hash was
    # in the old store
    assert all(h in old_refs for h, d in delta.items() if d < 0)


def test_cdc_chunks_string_ids_and_engine_validation(spark):
    import pytest

    from pdf_to_epub_spark.operators.cdc import cdc_chunks

    df = spark.createDataFrame(
        [("http://a", "x " * 200), ("http://b", None)],
        "url string, text string",
    )
    rows = cdc_chunks(df, id_col="url").collect()
    assert rows and all(r["url"] == "http://a" for r in rows)
    # the numpy engine path enforces the same parameter contract as the
    # pure reference loop
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(df, id_col="url", min_size=16)
    with pytest.raises(ValueError, match="max_size"):
        cdc_chunks(df, id_col="url", min_size=64, max_size=64)
