"""Snapshot delta tests (operators/delta.py): patch grammar roundtrip,
encode statuses (incl. NULL-text vs absent-row), apply reconstruction,
storage summary."""

from __future__ import annotations

import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.operators.delta import (  # noqa: E402
    apply_patch,
    delta_apply,
    delta_encode,
    delta_storage_summary,
    serialize_patch,
)


def test_patch_roundtrip_fuzz():
    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    for _ in range(200):
        old = "\n".join(
            " ".join(rng.choices(words, k=rng.randrange(0, 6)))
            for _ in range(rng.randrange(0, 12))
        )
        new = "\n".join(
            " ".join(rng.choices(words, k=rng.randrange(0, 6)))
            for _ in range(rng.randrange(0, 12))
        )
        assert apply_patch(old, serialize_patch(old, new)) == new


def test_patch_roundtrip_edges():
    for old, new in [
        ("", "x"), ("x", ""), ("a\n", "a"), ("a", "a\n"),
        ("", ""), ("a\nb\n", "a\nb"), (">quoted", ">quoted\n>more"),
        ("=1\n-2", "+3"),  # texts that LOOK like patch ops
    ]:
        assert apply_patch(old, serialize_patch(old, new)) == new


def test_patch_is_smaller_than_full_copy_for_small_edits():
    old = "\n".join(f"line number {i} with some text" for i in range(200))
    new = old.replace("line number 77 ", "line number 77 EDITED ")
    p = serialize_patch(old, new)
    assert apply_patch(old, p) == new
    assert len(p) < len(new) / 10


def test_encode_statuses_and_apply(spark):
    old = spark.createDataFrame(
        [
            (1, "a\nb\nc"),      # unchanged
            (2, "a\nb\nc"),      # changed
            (3, "gone"),          # deleted
            (5, None),            # NULL text present in both -> unchanged
            (6, None),            # NULL -> text (changed)
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "a\nb\nc"),
            (2, "a\nB!\nc"),
            (4, "brand new"),      # added
            (5, None),
            (6, "now present"),
        ],
        "doc_id long, text string",
    )
    deltas = delta_encode(old, new)
    by_id = {r["doc_id"]: r for r in deltas.collect()}
    assert by_id[1]["status"] == "unchanged" and by_id[1]["patch"] is None
    assert by_id[2]["status"] == "changed" and by_id[2]["patch"]
    assert by_id[3]["status"] == "deleted" and by_id[3]["new_md5"] is None
    assert by_id[4]["status"] == "added" and by_id[4]["old_md5"] is None
    assert by_id[5]["status"] == "unchanged"  # NULL == NULL, row present
    assert by_id[6]["status"] == "changed"
    assert by_id[4]["patch"] is not None  # added = patch against ""
    rebuilt = {r["doc_id"]: r["text"] for r in delta_apply(old, deltas).collect()}
    assert rebuilt == {
        1: "a\nb\nc", 2: "a\nB!\nc", 4: "brand new", 5: None, 6: "now present"
    }
    summary = {r["status"]: r for r in delta_storage_summary(deltas).collect()}
    assert summary["changed"]["n_docs"] == 2
    assert summary["unchanged"]["stored_bytes"] == 0
    assert summary["added"]["full_bytes"] == len("brand new")
