#!/usr/bin/env python3
"""Round-6 optimization harness — NOT part of the frozen bench contract.

Phase-isolated timings (noop sink per guide §1.4) and formatted-plan
capture for the heavy bench entries.  Usage:

    python bench_extra.py --plans              # dump plans/r06/<q>_<tag>.txt
    python bench_extra.py --probe containment  # phase timings, repeated
    python bench_extra.py --probe minhash_bigdocs --reps 3

Numbers quoted in OPTIMIZATION_r06.md come from interleaved same-window
runs of this script (the shared-VM ±35% window rule from PLANS.md).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import time

REPO = pathlib.Path(__file__).resolve().parent

import sys

sys.path.insert(0, str(REPO))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def get_session(cpus: int):
    from pdf_to_epub_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def load_corpus(spark, sf: float):
    import bench as benchmod

    return spark.read.parquet(benchmod.ensure_corpus(sf))


# ---------------------------------------------------------------- phases


def phases_containment(spark, corpus, sf_dir):
    """The bench `containment_pairs` entry, split at its plan joints."""
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.dedup import (
        _cold_shingle_sets,
        _doc_shingle_hash_table,
        containment_pairs,
    )

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    excerpts = toks.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice("_tk", F.lit(1), ((F.size("_tk") + 1) / 2).cast("int"))
        ).alias("text"),
    )
    union = docs.unionByName(excerpts)

    def p_shingle():
        _force(_doc_shingle_hash_table(union, "text", "doc_id", 5))

    def p_cold():
        hashed = _doc_shingle_hash_table(union, "text", "doc_id", 5).localCheckpoint(
            eager=False
        )
        _force(_cold_shingle_sets(hashed, 8))

    def p_full():
        _force(containment_pairs(union, k=5, threshold=0.8, max_df=8))

    return {"shingle_table": p_shingle, "cold_sets": p_cold, "full": p_full}


def phases_minhash_bigdocs(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import minhash_candidate_pairs
    from pdf_to_epub_spark.operators.dedup import (
        _lsh_band_pairs,
        minhash_signatures,
        with_shingles,
    )

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), F.col("text"))

    def p_shingles():
        _force(with_shingles(docs.select("doc_id", "text"), "text", 5))

    def p_sigs():
        _force(minhash_signatures(docs, "text", "doc_id", 5, 32))

    def p_pairs():
        sigs = minhash_signatures(docs, "text", "doc_id", 5, 32)
        _force(_lsh_band_pairs(sigs, "doc_id", 32, 8))

    def p_full():
        _force(
            minhash_candidate_pairs(
                docs, k=5, num_hashes=32, bands=8, jaccard_threshold=0.7
            )
        )

    return {
        "shingles": p_shingles,
        "signatures": p_sigs,
        "band_pairs": p_pairs,
        "full": p_full,
    }


def phases_oph_bigdocs(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import oph_minhash_pairs
    from pdf_to_epub_spark.operators.dedup import oph_minhash_signatures

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), F.col("text"))

    def p_sigs():
        _force(oph_minhash_signatures(docs, "text", "doc_id", 5, 32))

    def p_full():
        _force(
            oph_minhash_pairs(
                docs, k=5, num_hashes=32, bands=8, jaccard_threshold=0.7
            )
        )

    return {"signatures": p_sigs, "full": p_full}


def phases_simhash(spark, corpus, sf_dir):
    import __spark_entry__ as entrymod
    from pdf_to_epub_spark.operators import simhash_near_pairs
    from pdf_to_epub_spark.operators.dedup import simhash64

    md = entrymod.mutated_recrawl(spark, sf_dir)

    def p_fingerprint():
        _force(simhash64(md, "text", "doc_id"))

    def p_full():
        _force(simhash_near_pairs(md, max_hamming=3))

    return {"fingerprint": p_fingerprint, "full": p_full}


def phases_decontamination(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.dedup import contamination_spans, mask_spans

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
    bench = docs.orderBy("doc_id").limit(20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

    def p_spans():
        _force(contamination_spans(docs, bench, k=8))

    def p_full():
        spans = contamination_spans(docs, bench, k=8).select(
            "doc_id", "span_start", "span_end"
        )
        _force(mask_spans(docs, spans))

    return {"spans": p_spans, "full": p_full}


def phases_kn(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import (
        kn_bigram_scores,
        lm_partition,
        train_kn_bigram,
    )

    docs = corpus.select(F.col("url").alias("doc_id"), "text")

    def p_train():
        model = train_kn_bigram(docs, vocab_size=4096)
        for name, t in model.items():
            if hasattr(t, "write"):
                _force(t)

    def p_full():
        model = train_kn_bigram(docs, vocab_size=4096)
        _force(lm_partition(kn_bigram_scores(docs, model, vocab_size=4096)))

    return {"train": p_train, "full": p_full}


def phases_text_reuse(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import text_reuse_spans

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")
    toks = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    excerpts = toks.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.concat_ws(
            " ", F.slice("_tk", F.lit(1), ((F.size("_tk") + 1) / 2).cast("int"))
        ).alias("text"),
    )
    prs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )

    def p_full():
        _force(text_reuse_spans(docs.unionByName(excerpts), prs, k=5, min_run=3))

    return {"full": p_full}


def phases_lm_pack(spark, corpus, sf_dir):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import bigram_lm_scores, packed_texts

    docs = corpus.select(F.xxhash64("url").alias("doc_id"), "text")

    def p_scores():
        _force(bigram_lm_scores(docs))

    def p_pack():
        _force(packed_texts(docs, max_tokens=2048, n_shards=64))

    def p_full():
        _force(bigram_lm_scores(docs))
        _force(packed_texts(docs, max_tokens=2048, n_shards=64))

    return {"scores": p_scores, "pack": p_pack, "full": p_full}


def phases_ngram_jaccard(spark, corpus, sf_dir):
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def p_full():
        _force(queries["ngram_jaccard_pairs"](spark, sf_dir))

    return {"full": p_full}


def phases_incremental(spark, corpus, sf_dir):
    import shutil

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from pdf_to_epub_spark.operators import (
        incremental_near_dup_pairs,
        minhash_signatures,
    )

    corpus_md = entrymod.mutated_recrawl(spark, sf_dir)
    old_half = corpus_md.where(F.col("doc_id") < 1_000_000)
    pending = corpus_md.where(F.col("doc_id") >= 1_000_000).select("doc_id")
    incr_store = str(REPO / "data" / "extra_incr_sigs")
    shutil.rmtree(incr_store, ignore_errors=True)
    minhash_signatures(old_half, k=3, num_hashes=32).write.parquet(incr_store)

    def p_full():
        _force(
            incremental_near_dup_pairs(
                corpus_md, pending, incr_store,
                k=3, num_hashes=32, bands=8, jaccard_threshold=0.7,
            )
        )

    return {"full": p_full}


def phases_absuite(spark, corpus, sf_dir):
    """Fixed heavy-entry subset for config A/Bs (one JVM per config,
    interleave configs across subprocess runs)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from pdf_to_epub_spark.operators import (
        bigram_lm_scores,
        containment_pairs,
        minhash_candidate_pairs,
        packed_texts,
        simhash_near_pairs,
    )
    from pdf_to_epub_spark.operators import (
        kn_bigram_scores,
        lm_partition,
        train_kn_bigram,
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
    kdocs = corpus.select(F.col("url").alias("doc_id"), "text")

    def p_minhash():
        _force(
            minhash_candidate_pairs(
                docs, k=5, num_hashes=32, bands=8, jaccard_threshold=0.7
            )
        )

    def p_containment():
        _force(containment_pairs(union, k=5, threshold=0.8, max_df=8))

    def p_lm_pack():
        _force(bigram_lm_scores(docs))
        _force(packed_texts(docs, max_tokens=2048, n_shards=64))

    def p_kn():
        model = train_kn_bigram(kdocs, vocab_size=4096)
        _force(lm_partition(kn_bigram_scores(kdocs, model, vocab_size=4096)))

    def p_simhash():
        _force(
            simhash_near_pairs(entrymod.mutated_recrawl(spark, sf_dir), max_hamming=3)
        )

    return {
        "minhash": p_minhash,
        "containment": p_containment,
        "lm_pack": p_lm_pack,
        "kn": p_kn,
        "simhash": p_simhash,
    }


PROBES = {
    "absuite": phases_absuite,
    "containment": phases_containment,
    "minhash_bigdocs": phases_minhash_bigdocs,
    "oph_bigdocs": phases_oph_bigdocs,
    "simhash": phases_simhash,
    "decontamination": phases_decontamination,
    "kn": phases_kn,
    "text_reuse": phases_text_reuse,
    "lm_pack": phases_lm_pack,
    "ngram_jaccard": phases_ngram_jaccard,
    "incremental": phases_incremental,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--probe", default=None, choices=sorted(PROBES))
    ap.add_argument("--phase", default=None, help="only this phase")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench as benchmod

    sf = benchmod._sf_from_dir(args.sf_dir)
    spark = get_session(args.cpus)
    corpus = load_corpus(spark, sf)
    corpus.count()

    out: dict[str, list[float]] = {}
    phases = PROBES[args.probe](spark, corpus, args.sf_dir)
    if args.phase:
        phases = {args.phase: phases[args.phase]}
    for rep in range(args.reps):
        for name, fn in phases.items():
            spark.sparkContext.setJobDescription(f"{args.probe}:{name}#{rep}")
            t0 = time.perf_counter()
            fn()
            dt = round(time.perf_counter() - t0, 3)
            out.setdefault(name, []).append(dt)
            print(json.dumps({"phase": name, "rep": rep, "sec": dt}), flush=True)
    print(json.dumps({"probe": args.probe, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
