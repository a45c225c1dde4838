"""Snapshot delta encoding — store a recrawl as patches, not pages.

A daily web recrawl re-fetches mostly-unchanged pages; storing every
snapshot in full costs N× the corpus.  This module turns snapshot N+1
into per-document line-level edit scripts against snapshot N:

* ``delta_encode(old, new)`` — full-outer join on the document key,
  per-doc status (unchanged / changed / added / deleted), and for
  changed+added docs a deterministic patch (difflib.SequenceMatcher
  opcodes, ``autojunk=False``, serialized with the compact op grammar
  below).  Unchanged docs store NOTHING but the status row.
* ``delta_apply(old, deltas)`` — exact reconstruction of snapshot N+1.

Patch grammar (one op per line; insert payload lines prefixed ``>``):

    =<n>   copy n lines from old
    -<n>   drop n lines from old
    +<n>   insert the following n ``>``-prefixed lines

``text.split("\\n")`` / ``"\\n".join`` round-trips every string exactly
(trailing-newline case included), so reconstruction is byte-exact —
the engine verifies it by md5 per document.

Scale notes: both snapshots join on the document key — write snapshots
bucketed by that key and the join is co-located (no full-text shuffle;
see operators/bucketing.py).  The diff UDF is Arrow-batched and its
INPUT is gated to changed/added rows (``when(gate, col)`` feeding the
UDF, not a CASE around the call — SPARK-22347: a UDF inside CASE WHEN
still runs for every row).  Added docs are encoded as a patch against
the empty document, so one code path reconstructs both.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from pyspark.sql import DataFrame, functions as F


def serialize_patch(old_text: str, new_text: str) -> str:
    """Deterministic line-level edit script from ``old_text`` to
    ``new_text`` (see module grammar)."""
    a = old_text.split("\n")
    b = new_text.split("\n")
    out: list[str] = []
    for tag, i1, i2, j1, j2 in SequenceMatcher(
        None, a, b, autojunk=False
    ).get_opcodes():
        if tag == "equal":
            out.append(f"={i2 - i1}")
        elif tag == "delete":
            out.append(f"-{i2 - i1}")
        elif tag == "insert":
            out.append(f"+{j2 - j1}")
            out.extend(">" + line for line in b[j1:j2])
        else:  # replace
            out.append(f"-{i2 - i1}")
            out.append(f"+{j2 - j1}")
            out.extend(">" + line for line in b[j1:j2])
    return "\n".join(out)


def apply_patch(old_text: str, patch: str) -> str:
    """Exact inverse of :func:`serialize_patch`."""
    a = old_text.split("\n")
    out: list[str] = []
    pos = 0
    lines = patch.split("\n") if patch else []
    k = 0
    while k < len(lines):
        op = lines[k]
        k += 1
        if not op:
            continue
        kind, n = op[0], int(op[1:])
        if kind == "=":
            out.extend(a[pos : pos + n])
            pos += n
        elif kind == "-":
            pos += n
        elif kind == "+":
            for _ in range(n):
                ins = lines[k]
                if not ins.startswith(">"):
                    raise ValueError(f"malformed insert payload: {ins!r}")
                out.append(ins[1:])
                k += 1
        else:
            raise ValueError(f"unknown patch op {op!r}")
    return "\n".join(out)


def delta_encode(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document delta between two snapshots; returns
    ``(id, status, old_md5, new_md5, patch, patch_bytes, full_bytes)``.

    status: deleted (key absent from new), added (absent from old),
    unchanged (md5-equal), changed.  ``patch`` is non-null only for
    changed/added; ``full_bytes`` is the new text's UTF-8 size (the cost
    a full-copy store would pay), ``patch_bytes`` the patch's."""
    import pandas as pd
    from pyspark.sql.types import StringType

    o = old.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__old")
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__new"),
        F.lit(True).alias("__in_new"),
    )
    old_md5 = F.md5(F.col("__old").cast("binary"))
    new_md5 = F.md5(F.col("__new").cast("binary"))

    @F.pandas_udf(StringType())
    def _diff(olds, news):  # no type hints: stringized-annotation rule
        out = []
        for ot, nt in zip(olds, news):
            if nt is None:
                out.append(None)
            else:
                out.append(serialize_patch(ot if ot is not None else "", nt))
        return pd.Series(out, dtype="object")

    # presence markers (old side needs one too: NULL text != absent row,
    # the r4s2 recrawl_diff lesson)
    o2 = o.withColumn("__had_old", F.lit(True))
    j = o2.join(n, "__id", "full_outer")
    gate = F.col("__in_new").isNotNull() & (
        F.col("__had_old").isNull()
        | ~F.coalesce(old_md5.eqNullSafe(new_md5), F.lit(False))
    )
    status = (
        F.when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(F.col("__had_old").isNull(), F.lit("added"))
        .when(old_md5.eqNullSafe(new_md5), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    patch = _diff(
        F.when(gate, F.coalesce(F.col("__old"), F.lit(""))),
        F.when(gate, F.col("__new")),
    )
    return (
        j.withColumn("status", status)
        .withColumn("patch", patch)
        .select(
            F.col("__id").alias(id_col),
            "status",
            F.when(F.col("__had_old").isNotNull(), old_md5).alias("old_md5"),
            F.when(F.col("__in_new").isNotNull(), new_md5).alias("new_md5"),
            "patch",
            F.length(F.col("patch").cast("binary")).alias("patch_bytes"),
            F.when(
                F.col("__in_new").isNotNull(),
                F.length(F.coalesce(F.col("__new").cast("binary"), F.lit(b""))),
            ).alias("full_bytes"),
        )
    )


def delta_apply(
    old: DataFrame,
    deltas: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reconstruct the new snapshot from the old one plus deltas:
    unchanged -> old text, changed/added -> patch applied, deleted ->
    dropped.  Same co-located-join scale contract as delta_encode."""
    import pandas as pd
    from pyspark.sql.types import StringType

    o = old.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__old"))
    d = deltas.select(
        F.col(id_col).alias("__id"), "status", "patch"
    ).filter(F.col("status") != "deleted")
    j = d.join(o, "__id", "left")

    @F.pandas_udf(StringType())
    def _apply(olds, patches):  # no type hints: stringized-annotation rule
        out = []
        for ot, p in zip(olds, patches):
            if p is None:
                out.append(None)
            else:
                out.append(apply_patch(ot if ot is not None else "", p))
        return pd.Series(out, dtype="object")

    gate = F.col("status").isin("changed", "added")
    rebuilt = _apply(
        F.when(gate, F.coalesce(F.col("__old"), F.lit(""))),
        F.when(gate, F.col("patch")),
    )
    return j.select(
        F.col("__id").alias(id_col),
        F.when(gate, rebuilt).otherwise(F.col("__old")).alias(text_col),
    )


def delta_storage_summary(deltas: DataFrame) -> DataFrame:
    """One row per status: docs, patch bytes stored vs full-copy bytes."""
    return (
        deltas.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("patch_bytes", F.lit(0))).alias("stored_bytes"),
            F.sum(F.coalesce("full_bytes", F.lit(0))).alias("full_bytes"),
        )
        .orderBy("status")
    )
