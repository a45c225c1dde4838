#!/usr/bin/env python3
"""Capture .explain('formatted') for the bench-entry query shapes touched
in optimization round 6 → plans/r06/<name>_<tag>.txt.

Usage: python tools/gen_plans_r06.py <tag> [name ...]
"""

from __future__ import annotations

import io
import pathlib
import sys
from contextlib import redirect_stdout

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402


def build_targets(spark, corpus, sf_dir):
    import __spark_entry__ as entrymod
    from pdf_to_epub_spark.operators import (
        bigram_lm_scores,
        containment_pairs,
        minhash_candidate_pairs,
        oph_minhash_pairs,
        packed_texts,
        simhash_near_pairs,
        text_reuse_spans,
    )
    from pdf_to_epub_spark.operators.dedup import (
        contamination_spans,
        mask_spans,
        minhash_signatures,
    )

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), F.col("text"))
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    excerpts = toks.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice("_tk", F.lit(1), ((F.size("_tk") + 1) / 2).cast("int"))
        ).alias("text"),
    )
    union = docs.unionByName(excerpts)
    md = entrymod.mutated_recrawl(spark, sf_dir)
    bench20 = docs.orderBy("doc_id").limit(20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    prs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    queries = entrymod.queries()

    spans = contamination_spans(docs, bench20, k=8).select(
        "doc_id", "span_start", "span_end"
    )

    # Pre-checkpoint internals (the public DataFrames hide everything
    # below their lazy localCheckpoint barrier behind a Scan ExistingRDD).
    from pdf_to_epub_spark.operators.dedup import (
        _cold_shingle_sets,
        _doc_shingle_hash_table,
        _lsh_band_pairs,
        _score_pairs_exact_jaccard,
        _score_pairs_from_shingle_sets,
    )

    def containment_cand():
        hashed = _doc_shingle_hash_table(union, "text", "doc_id", 5).localCheckpoint(
            eager=False
        )
        filt = _cold_shingle_sets(hashed, 8)
        n = F.size("hs")
        from pdf_to_epub_spark.operators.dedup import _hot_adjusted_prefix_len

        index = filt.select("id", F.explode_outer("hs_f").alias("h")).where(
            F.col("h").isNotNull()
        )
        probe = filt.select(
            "id",
            F.explode_outer(
                F.slice("hs_f", F.lit(1), _hot_adjusted_prefix_len(0.8))
            ).alias("h"),
        ).where(F.col("h").isNotNull())
        probe = probe.hint("shuffle_hash")  # mirrors containment_pairs (r6)
        p, ix = probe.alias("p"), index.alias("ix")
        return (
            p.join(
                ix,
                on=[F.col("p.h") == F.col("ix.h"), F.col("p.id") != F.col("ix.id")],
            )
            .select(
                F.least(F.col("p.id"), F.col("ix.id")).alias("id_a"),
                F.greatest(F.col("p.id"), F.col("ix.id")).alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )

    def containment_scored():
        hashed = _doc_shingle_hash_table(union, "text", "doc_id", 5).localCheckpoint(
            eager=False
        )
        return _score_pairs_from_shingle_sets(
            hashed.select("id", F.col("hs").alias("_sh")), containment_cand()
        )

    def containment_cold():
        hashed = _doc_shingle_hash_table(union, "text", "doc_id", 5).localCheckpoint(
            eager=False
        )
        ex = hashed.select("id", F.explode_outer("hs").alias("h")).where(
            F.col("h").isNotNull()
        )
        hot = (
            ex.groupBy("h")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > 8)
            .select("h")
        )
        hot_per_doc = (
            ex.join(hot, "h").groupBy("id").agg(F.collect_list("h").alias("_hot_hs"))
        )
        empty = F.array().cast("array<bigint>")
        return hashed.join(hot_per_doc, "id", "left").select(
            "id",
            F.size("hs").alias("_n"),
            F.array_except("hs", F.coalesce(F.col("_hot_hs"), empty)).alias("hs_f"),
        )

    def minhash_scored():
        sigs = minhash_signatures(docs, "text", "doc_id", 5, 32)
        pairs = _lsh_band_pairs(sigs, "doc_id", 32, 8)
        return _score_pairs_exact_jaccard(docs, pairs, "text", "doc_id", 5)

    return {
        "containment_cand": containment_cand,
        "containment_scored": containment_scored,
        "containment_cold": containment_cold,
        "minhash_scored": minhash_scored,
        "minhash_bigdocs": lambda: minhash_candidate_pairs(
            docs, k=5, num_hashes=32, bands=8, jaccard_threshold=0.7
        ),
        "minhash_signatures": lambda: minhash_signatures(
            docs, "text", "doc_id", 5, 32
        ),
        "oph_minhash_bigdocs": lambda: oph_minhash_pairs(
            docs, k=5, num_hashes=32, bands=8, jaccard_threshold=0.7
        ),
        "simhash_pairs": lambda: simhash_near_pairs(md, max_hamming=3),
        "containment_pairs": lambda: containment_pairs(
            union, k=5, threshold=0.8, max_df=8
        ),
        "ngram_jaccard_pairs": lambda: queries["ngram_jaccard_pairs"](
            spark, sf_dir
        ),
        "decontamination_spans": lambda: contamination_spans(docs, bench20, k=8),
        "decontamination_mask": lambda: mask_spans(docs, spans),
        "text_reuse_spans": lambda: text_reuse_spans(union, prs, k=5, min_run=3),
        "lm_scores": lambda: bigram_lm_scores(docs),
        "lm_packed_texts": lambda: packed_texts(docs, max_tokens=2048, n_shards=64),
        "minhash_pairs": lambda: queries["minhash_pairs"](spark, sf_dir),
    }


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = "/root/testdata/sf0.1"

    import bench as benchmod
    import bench_extra

    spark = bench_extra.get_session(32)
    corpus = spark.read.parquet(benchmod.ensure_corpus(0.1))
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name, fn in build_targets(spark, corpus, sf_dir).items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn().explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue(), encoding="utf-8")
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
