"""TFRecord sink/source tests (pdf_to_epub_spark/sources/tfrecord.py):
wire-format vectors, proto roundtrip, CRC integrity, determinism, and
the distributed write->binaryFile->parse roundtrip."""

from __future__ import annotations

import pathlib
import struct
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.sources.tfrecord import (  # noqa: E402
    build_tfrecord_bytes,
    crc32c,
    decode_example,
    encode_example,
    iter_tfrecord_bytes,
    masked_crc32c,
    parse_tfrecord_contents,
    read_tfrecord_paths,
    write_tfrecords,
)


def test_crc32c_standard_vectors():
    # RFC 3720 / Castagnoli check value and the all-zeros vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"") == 0


def test_masked_crc_matches_tfrecord_rule():
    c = crc32c(b"abc")
    rot = ((c >> 15) | ((c << 17) & 0xFFFFFFFF)) & 0xFFFFFFFF
    assert masked_crc32c(b"abc") == (rot + 0xA282EAD8) & 0xFFFFFFFF


def test_example_roundtrip_all_kinds():
    feats = {
        "text": b"hello \xe2\x9c\x93",
        "tags": [b"a", b"bb"],
        "ids": [0, 1, 300, 2**40, -5],
        "score": [0.5, -2.25],
        "empty": [],
    }
    out = decode_example(encode_example(feats))
    assert out["text"] == [b"hello \xe2\x9c\x93"]
    assert out["tags"] == [b"a", b"bb"]
    assert out["ids"] == [0, 1, 300, 2**40, -5]
    assert out["score"] == [0.5, -2.25]  # f32-exact values
    assert out["empty"] == []


def test_float_passes_through_float32():
    out = decode_example(encode_example({"s": [0.1]}))
    assert out["s"][0] == struct.unpack("<f", struct.pack("<f", 0.1))[0]
    assert out["s"][0] != 0.1


def test_encoding_is_key_order_deterministic():
    a = encode_example({"b": b"x", "a": [1], "c": [0.5]})
    b = encode_example({"c": [0.5], "a": [1], "b": b"x"})
    assert a == b


def test_framing_roundtrip_and_integrity():
    exs = [encode_example({"i": [n]}) for n in range(5)]
    blob = build_tfrecord_bytes(exs)
    assert [decode_example(r)["i"] for r in iter_tfrecord_bytes(blob)] == [
        [n] for n in range(5)
    ]
    # flip one payload byte -> data CRC must catch it
    bad = bytearray(blob)
    bad[14] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(iter_tfrecord_bytes(bytes(bad)))
    # truncation mid-record must raise, not silently drop the tail
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecord_bytes(blob[:-3]))
    # verify_crc=False still parses the corrupt-CRC blob's framing
    assert len(list(iter_tfrecord_bytes(blob, verify_crc=False))) == 5


def test_spark_write_read_roundtrip(spark, tmp_path):
    rows = [
        (i, f"doc-{i}", f"body text {i} é", [i, i * 2], float(i) / 4.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, text string, toks array<long>, score double"
    ).withColumn("text_b", F.col("text").cast("binary"))
    out = tmp_path / "shards"
    write_tfrecords(
        df.repartition(3, "doc_id"),
        str(out),
        bytes_cols=("url", "text_b"),
        int_cols=("doc_id", "toks"),
        float_cols=("score",),
        order_col="doc_id",
    )
    shard_names = sorted(p.name for p in out.iterdir())
    assert all(n.endswith(".tfrecord") for n in shard_names)
    assert not any("inprogress" in n for n in shard_names)
    files = read_tfrecord_paths(spark, str(out / "*.tfrecord"))
    parsed = parse_tfrecord_contents(
        files,
        bytes_cols=("url", "text_b"),
        int_cols=("doc_id", "toks"),
        float_cols=("score",),
    )
    got = {
        r["doc_id"][0]: (r["url"], r["text_b"], r["toks"], r["score"][0])
        for r in parsed.collect()
    }
    assert len(got) == 40
    for i, url, text, toks, score in rows:
        g = got[i]
        assert g[0] == url
        assert g[1] == text
        assert g[2] == toks
        assert g[3] == score  # /4 values are f32-exact


def test_export_packed_tfrecords_roundtrip(spark, tmp_path):
    from pdf_to_epub_spark.operators import packed_texts
    from pdf_to_epub_spark.pipeline import export_packed_tfrecords
    from pdf_to_epub_spark.sources.tfrecord import (
        parse_tfrecord_contents,
        read_tfrecord_paths,
    )

    docs = spark.createDataFrame(
        [(i, f"split{'AB'[i % 2]}", f"document body {i} " * (3 + i % 5))
         for i in range(40)],
        "doc_id long, split string, text string",
    )
    packed = None
    for name in ("splitA", "splitB"):
        p = packed_texts(
            docs.where(F.col("split") == name), max_tokens=32, n_shards=4
        ).withColumn("split", F.lit(name))
        packed = p if packed is None else packed.unionByName(p)
    expected = {
        (r["split"], r["shard"], r["seq_id"]): (r["text"], r["n_docs"])
        for r in packed.collect()
    }
    out = tmp_path / "tfr"
    export_packed_tfrecords(packed, str(out), files_per_split=2)
    got = {}
    for name in ("splitA", "splitB"):
        files = read_tfrecord_paths(spark, str(out / f"split={name}" / "*.tfrecord"))
        parsed = parse_tfrecord_contents(
            files,
            bytes_cols=("text_b",),
            int_cols=("shard", "seq_id", "n_docs", "fill_tokens"),
        )
        for r in parsed.collect():
            got[(name, r["shard"][0], r["seq_id"][0])] = (
                r["text_b"], r["n_docs"][0]
            )
    assert got == expected


def test_encode_feature_accepts_bytearray():
    # Spark 3.x hands BinaryType to Python as bytearray
    out = decode_example(
        encode_example({"b": bytearray(b"abc"), "lb": [bytearray(b"x")]})
    )
    assert out["b"] == [b"abc"] and out["lb"] == [b"x"]
