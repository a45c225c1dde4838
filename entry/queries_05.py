"""Driver query builders (part 5/7 of the mechanical __spark_entry__ split; verbatim)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pathlib
from entry._shared import _ship_package, _t
from entry.queries_04 import _MOJI_FRAGS


def _q_amp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared AMP twin graph (urls.extract_amp_pairs): every 3k page
    declares its AMP twin, every 3k+1 is the AMP page pointing back
    (html-attribute marker + rel=canonical), every 3k+2 is a plain page
    with a canonical link that must NOT emit (not an AMP page)."""
    from pdf_to_epub_spark.operators import extract_amp_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    r = i % 3
    html = (
        F.when(
            r == 0,
            F.concat(
                F.lit('<html><head><link rel="amphtml" href="https://e/amp/'),
                s, F.lit('"></head></html>'),
            ),
        )
        .when(
            r == 1,
            F.concat(
                F.lit('<html amp lang="en"><head><link rel="canonical" href="https://e/'),
                s, F.lit('"></head></html>'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<html><link rel="canonical" href="https://e/x/'),
                s, F.lit('"></html>'),
            )
        )
    )
    pages = d.select(
        F.concat(F.lit("https://e/p"), s).alias("url"), html.alias("html")
    )
    return extract_amp_pairs(pages)


def _q_declared_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-declared language ladder (urls.extract_declared_lang):
    html lang attr (region-tagged, mixed case) > http-equiv list >
    og:locale underscore form > nothing declared."""
    from pdf_to_epub_spark.operators import extract_declared_lang

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    r = i % 4
    html = (
        F.when(r == 0, F.lit('<html lang="PT-br"><head></head></html>'))
        .when(
            r == 1,
            # content BEFORE http-equiv: attribute order is free in the
            # wild, and the tag-scoped extractor must not care.
            F.lit('<head><meta content="fr, en" http-equiv="Content-Language"></head>'),
        )
        .when(
            r == 2,
            F.lit('<head><meta property="og:locale" content="de_DE"></head>'),
        )
        .otherwise(F.lit("<html><body>nothing declared</body></html>"))
    )
    pages = d.select(
        F.concat(F.lit("https://e/l"), s).alias("url"), html.alias("html")
    )
    return extract_declared_lang(pages)


def _q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader manifest over the training-shard layout
    (sampling.shard_manifest): per-shard doc/token/char volumes and the
    order-independent sorted-md5 checksum, same salt/shard-count
    conventions as the training_shards query."""
    from pdf_to_epub_spark.operators import shard_manifest

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return shard_manifest(d, n_shards=16, salt="epoch0")


def _phash_media_payloads() -> list[tuple[int, bytes]]:
    """The 8 residue-class media payloads for the perceptual-dedup
    query (pure function — shared by the Spark query and the oracle
    replay): base image, its 2× rescale (aHash-equal), a one-cell
    perturbation (Hamming 1), a far image, an audio pair, far audio,
    and a junk row that must surface as unsupported."""
    import math

    from pdf_to_epub_spark.functions.mediacodec import make_bmp, make_wav

    def grad(d):
        return lambda x, y: ((x * 255 // d) & 0xFF,) * 3

    def near(x, y):
        return (
            min(255, (x * 255 // 16) + (200 if (x < 2 and y < 2) else 0)),
        ) * 3

    def far(x, y):
        return ((y * 255 // 16) & 0xFF, (x * 17) & 0xFF, 0)

    def sine(f1, f2, amp):
        return [
            int(amp * math.sin(2 * math.pi * f1 * t / 8000)
                + 4000 * math.sin(2 * math.pi * f2 * t / 8000))
            for t in range(1600)
        ]

    return [
        (0, make_bmp(16, 16, grad(16))),
        (1, make_bmp(32, 32, grad(32))),
        (2, make_bmp(16, 16, near)),
        (3, make_bmp(16, 16, far)),
        (4, make_wav(sine(300, 1200, 9000))),
        (5, make_wav(sine(300, 1200, 9000))),
        (6, make_wav(sine(700, 2500, 2000))),
        (7, b"not media at all"),
    ]


def _q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media dedup (multimodal.media_fingerprints +
    media_dedup_clusters): every document carries one of 8 residue-class
    payloads; rescaled copies must hash EQUAL, the one-cell perturbation
    must cluster within Hamming 1, far content must stand alone, junk
    must drop as unsupported."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.multimodal import (
        media_dedup_clusters,
        media_fingerprints,
    )

    payloads = spark.createDataFrame(
        [(r, bytearray(p)) for r, p in _phash_media_payloads()],
        "cls long, payload binary",
    )
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 8).alias("cls"),
    )
    media = docs.join(F.broadcast(payloads), "cls").select(
        "media_id", "payload"
    )
    fps = media_fingerprints(media, salt_partitions=8)
    return media_dedup_clusters(fps)


def _media_phash_oracle() -> str:
    """Golden VALUES: per-class fingerprint + one-hop min-label rep
    replayed in pure Python over the distinct class fingerprints."""
    from pdf_to_epub_spark.functions.mediacodec import (
        ahash64,
        audio_fingerprint64,
        decode_bmp,
        decode_wav,
        hamming64,
        to_signed64,
    )

    rows = []
    for r, payload in _phash_media_payloads():
        if payload[:2] == b"BM":
            w, h, gray = decode_bmp(payload)
            rows.append((r, "image", to_signed64(ahash64(gray, w, h))))
        elif payload[:4] == b"RIFF":
            _, _, samples = decode_wav(payload)
            rows.append((r, "audio", to_signed64(audio_fingerprint64(samples))))
    reps: dict[int, int] = {}
    for r, kind, fp in rows:
        within = [
            fp2 for _, k2, fp2 in rows
            if k2 == kind and hamming64(fp, fp2) <= 3
        ]
        reps[r] = min(within)
    vals = ",\n            ".join(
        f"({r}, '{kind}', {fp}, {reps[r]})" for r, kind, fp in rows
    )
    return f"""
        WITH golden(r, kind, fp, rep_fp) AS (VALUES
            {vals})
        SELECT d.doc_id AS media_id, g.kind, g.fp::BIGINT AS fp,
               g.rep_fp::BIGINT AS rep_fp, 'ok' AS status
        FROM documents d JOIN golden g ON d.doc_id % 8 = g.r
    """


def _q_repair_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated cp1252 round-trip repair (textstats.repair_mojibake) over 8
    residue classes of damage — repairable mojibake, double-encoding,
    clean ASCII, genuine accents, and an undecodable surrogate run that
    must pass through byte-identical.  The oracle replays the repair in
    pure Python per class (golden-VALUES, the compression_ratio
    convention)."""
    from pdf_to_epub_spark.operators import repair_mojibake

    d = _t(spark, sf_dir, "documents").select("doc_id")
    frag = F.lit(_MOJI_FRAGS[0])
    for r in range(1, 8):
        frag = F.when(F.col("doc_id") % 8 == r, F.lit(_MOJI_FRAGS[r])).otherwise(frag)
    text = F.concat(frag, F.lit(" tail "), F.col("doc_id").cast("string"))
    return repair_mojibake(d.select("doc_id", text.alias("text")))


def _mojibake_oracle() -> str:
    """Golden VALUES: per residue class the repaired fragment, run
    count, and repaired verdict computed by the same pure-Python
    function the Arrow UDF maps."""
    from pdf_to_epub_spark.operators import fix_mojibake_text
    from pdf_to_epub_spark.operators.textstats import _moji_run_re

    vals = []
    for r, frag in enumerate(_MOJI_FRAGS):
        fixed = fix_mojibake_text(frag)
        n_runs = len(_moji_run_re().findall(frag))
        rep = "TRUE" if fixed != frag else "FALSE"
        vals.append(f"({r}, '{fixed}', {n_runs}, {rep})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, fixed, n_runs, repaired) AS (VALUES
            {rows})
        SELECT d.doc_id,
               g.fixed || ' tail ' || CAST(d.doc_id AS VARCHAR) AS text,
               g.n_runs::INT AS n_runs,
               g.repaired AS repaired
        FROM documents d JOIN golden g ON d.doc_id % 8 = g.r
    """


def _q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-lang vs script-evidence audit
    (textstats.lang_script_mismatch) over the script_ratios fixture text
    (residue-class script suffixes) with the real lang column — zh-tagged
    docs whose letters stay Latin-dominant must flag, unknown-script
    residues abstain."""
    from pdf_to_epub_spark.operators import lang_script_mismatch

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0, " привет мир здравствуй")
        .when(F.col("doc_id") % 4 == 1, " γειά σου κόσμε")
        .when(F.col("doc_id") % 4 == 2, " 你好世界再见")
        .otherwise(" plain")
    )
    text = F.concat(F.substring("text", 1, 30), suffix)
    pages = d.select("doc_id", "lang", text.alias("text"))
    return lang_script_mismatch(pages)


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth (textstats.vocab_growth): 16
    deterministic ingest batches, new-type attribution via min(batch)
    per type — cumulative type/token curve must reproduce exactly."""
    from pdf_to_epub_spark.operators import vocab_growth

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return vocab_growth(d, n_batches=16)


def _q_filter_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line corrections (textstats.filter_lines) over
    documents rebuilt as multi-line pages with injected junk lines
    (numeric, counter, all-caps nav, short boilerplate) — the cleaned
    text, drop counts, and whole-doc flag must reproduce."""
    from pdf_to_epub_spark.operators import filter_lines

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    text = F.concat(
        F.substring("text", 1, 60),
        F.lit("\n1,234\n42 likes\nHOME | ABOUT | CONTACT\n"),
        F.when(i % 3 == 0, F.lit("Please enable JavaScript now\n")).otherwise(
            F.lit("A second surviving prose line follows here.\n")
        ),
        F.substring("text", 61, 40),
    )
    return filter_lines(d.select("doc_id", text.alias("text")))


def _q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration profile (analytics.corpus_diversity) over a
    deterministic skewed domain assignment — entropy / effective-domain
    count / exact Gini / top-share from the counts-of-counts table."""
    from pdf_to_epub_spark.operators import corpus_diversity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    domain = F.concat(
        F.lit("site"),
        F.least(F.col("doc_id") % 16, F.col("doc_id") % 7).cast("string"),
    )
    return corpus_diversity(d.select(domain.alias("domain")), "domain")


# Shared relational NB replay (train + per-doc costs) — used by the
# nb_classifier oracle and composed further by classifier_eval.
_NB_SQL_CORE = """WITH lab AS (
                SELECT doc_id, doc_id % 2 = 0 AS label,
                       lower(coalesce(text, '')) AS t
                FROM documents WHERE doc_id % 3 = 0
            ),
            tok AS (
                SELECT label,
                       unnest(regexp_extract_all(t, '[a-zà-öø-ÿ]+')) AS tk
                FROM lab
            ),
            tokb AS (
                SELECT label,
                       ('0x' || substr(md5('nb:' || tk), 1, 15))::BIGINT % 512
                           AS bucket
                FROM tok
            ),
            cnt AS (
                SELECT label, bucket, count(*)::DOUBLE AS c
                FROM tokb GROUP BY 1, 2
            ),
            tot AS (
                SELECT label, count(*)::DOUBLE AS n FROM tokb GROUP BY 1
            ),
            grid AS (
                SELECT l.label, g.bucket
                FROM (SELECT DISTINCT label FROM lab) l
                CROSS JOIN (
                    SELECT unnest(generate_series(0, 511)) AS bucket) g
            ),
            cost AS (
                SELECT grid.label, grid.bucket,
                       floor(-ln((coalesce(cnt.c, 0) + 1.0)
                                 / (tot.n + 512.0)) * 1e6 + 0.5)::BIGINT
                           AS cost
                FROM grid
                JOIN tot USING (label)
                LEFT JOIN cnt ON cnt.label = grid.label
                             AND cnt.bucket = grid.bucket
            ),
            prior AS (SELECT label, count(*)::DOUBLE AS nd FROM lab GROUP BY 1),
            pcost AS (
                SELECT label,
                       floor(-ln(nd / (SELECT sum(nd) FROM prior)) * 1e6
                             + 0.5)::BIGINT AS pc
                FROM prior
            ),
            alltok AS (
                SELECT doc_id,
                       ('0x' || substr(md5('nb:' || tk), 1, 15))::BIGINT % 512
                           AS bucket
                FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[a-zà-öø-ÿ]+')) AS tk
                    FROM documents)
            ),
            dsum AS (
                SELECT a.doc_id, c.label, sum(c.cost)::BIGINT AS s,
                       count(*)::INTEGER AS nt
                FROM alltok a JOIN cost c USING (bucket)
                GROUP BY 1, 2
            ),
            pivoted AS (
                SELECT b.doc_id,
                       coalesce(max(CASE WHEN NOT d.label THEN d.s END), 0)
                           + (SELECT pc FROM pcost WHERE NOT label) AS cf,
                       coalesce(max(CASE WHEN d.label THEN d.s END), 0)
                           + (SELECT pc FROM pcost WHERE label) AS ct,
                       coalesce(max(d.nt), 0) AS n_tokens
                FROM (SELECT doc_id FROM documents) b
                LEFT JOIN dsum d ON d.doc_id = b.doc_id
                GROUP BY b.doc_id
            )"""


# Shared positional-shingle contamination replay (CTEs through the
# per-(doc, bench) interval merge g2) — composed by the
# contamination_spans and mask_contaminated oracles.
_CONTAM_SPANS_SQL_CORE = r"""WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                FROM documents),
            c AS (
                SELECT doc_id, len(toks) AS nt,
                       unnest(generate_series(
                           1, greatest(len(toks) - 7, 1))) AS i,
                       unnest(list_transform(
                           generate_series(1, greatest(len(toks) - 7, 1)),
                           i -> array_to_string(
                               list_slice(toks, i, i + 7), ' '))) AS sh
                FROM t),
            bench AS (
                SELECT DISTINCT doc_id AS bench_id,
                       unnest(CASE WHEN len(toks) >= 8 THEN
                           list_distinct(list_transform(
                               generate_series(1, len(toks) - 7),
                               i -> array_to_string(
                                   list_slice(toks, i, i + 7), ' ')))
                       ELSE [array_to_string(toks, ' ')] END) AS sh
                FROM t WHERE doc_id < 20),
            m AS (
                SELECT c.doc_id, b.bench_id, c.i - 1 AS pos,
                       least(c.i + 6, c.nt - 1) AS e
                FROM c JOIN bench b USING (sh)),
            g0 AS (
                SELECT *, max(e) OVER (
                    PARTITION BY doc_id, bench_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pmax
                FROM m),
            g1 AS (
                SELECT *, CASE WHEN pmax IS NULL OR pos > pmax + 1
                               THEN 1 ELSE 0 END AS flag
                FROM g0),
            g2 AS (
                SELECT *, sum(flag) OVER (
                    PARTITION BY doc_id, bench_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM g1)"""


def _q_crawl_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain fetch-cadence profile (urls.crawl_cadence): lag-window
    inter-arrival gaps over deterministic (domain, epoch) captures, then
    order-independent gap stats — integer gap sums drive the variance in
    a fixed parse shape and the median is Spark's exact percentile
    (== DuckDB quantile_cont)."""
    from pdf_to_epub_spark.operators import crawl_cadence

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    pages = d.select(
        F.concat(
            F.lit("https://sub"), (i % 3).cast("string"),
            F.lit(".site"), (i % 7).cast("string"),
            F.lit(".example/p"), i.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1735689600) + (i * 997) % 86400
        ).alias("warc_ts"),
    )
    return crawl_cadence(pages).select(
        "domain", "n_fetches", "mean_gap_s", "median_gap_s", "var_gap_s"
    )


def _q_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain co-citation mining (urls.cocitation_pairs): unordered
    domain pairs linked from the same page, counted across pages — the
    no-self-join HOF-combinations shape; the oracle replays it as a
    distinct self-join in DuckDB."""
    from pdf_to_epub_spark.operators import cocitation_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://p"), i.cast("string"), F.lit(".example/x"))
    targets = F.array(
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://b"), (i % 3).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/")),
        # duplicate target — the per-page set must be DISTINCT domains
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/dup")),
        # conditional 4th domain so per-page set sizes vary 3 / 4
        F.when(
            i % 2 == 0, F.lit("https://hub.example/")
        ).otherwise(
            F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/z"))
        ),
    )
    outlinks = d.select(
        url.alias("url"), F.explode(targets).alias("target")
    )
    return cocitation_pairs(outlinks, min_count=2).select(
        "domain_a", "domain_b", "n_pages"
    )


def _q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping sentence-window chunking
    (textstats.sentence_chunks, 3-sentence windows, stride 2) over the
    same deterministically-punctuated text as sentence_stats; the oracle
    replays the windows via 1-based DuckDB list slices over
    unnest(generate_series(...))."""
    from pdf_to_epub_spark.operators import sentence_chunks

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 40), F.lit(". "),
        F.substring("text", 41, 60), F.lit("! "),
        F.substring("text", 101, 50),
        F.when(i % 3 == 0, F.lit("? Short tail.")).otherwise(F.lit("...")),
    )
    return sentence_chunks(
        d.select("doc_id", txt.alias("text")), chunk_sents=3, stride=2
    ).select("doc_id", "chunk_id", "n_sents", "chunk_text")


def _q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile normalization + curriculum bucketing
    (sampling.quality_percentiles): percent_rank and ntile(4) over
    (score, doc_id) — deterministic tie-break, identical window
    semantics in DuckDB."""
    from pdf_to_epub_spark.operators import quality_percentiles

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").alias("score")
    )
    return quality_percentiles(d, buckets=4).select(
        "doc_id", "lang", "score", "pct", "bucket"
    )


def _q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection (analytics.event_anomalies): hourly counts
    per event type, z-scored against the type's own hourly distribution
    from exact integer sums in a fixed parse shape — the telemetry
    anomaly monitor; z_threshold=2 so the synthetic stream yields true
    bursts."""
    from pdf_to_epub_spark.operators import event_anomalies

    e = _t(spark, sf_dir, "events")
    return event_anomalies(e, z_threshold=2.0).select(
        "event_type", "bucket_epoch", "n_events", "z", "is_burst"
    )


def _q_title_body_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickbait signal (textstats.title_body_overlap): fraction of
    distinct title words grounded in the body — titles synthesized from
    the body prefix plus residue-varied alien tokens, with an
    empty-title branch."""
    from pdf_to_epub_spark.operators import title_body_overlap

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    title = F.when(i % 17 == 0, F.lit("")).otherwise(
        F.concat(
            F.substring("text", 1, 25),
            F.when(i % 4 == 0, F.lit(" zzqx")).otherwise(F.lit("")),
            F.when(i % 4 == 1, F.lit(" vvwy qqkj")).otherwise(F.lit("")),
        )
    )
    return title_body_overlap(
        d.select("doc_id", title.alias("title"), "text")
    ).select("doc_id", "n_title_tokens", "n_overlap", "overlap_ratio")


def _q_quote_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotation profile (textstats.quote_density) over text with
    synthesized quote segments (paired, residue-varied second quote, and
    a trailing unmatched quote) — one RE2-portable regex scan, replayed
    verbatim in DuckDB."""
    from pdf_to_epub_spark.operators import quote_density

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 60), F.lit(' "'),
        F.substring("text", 61, 20), F.lit('" said.'),
        F.when(i % 5 == 0, F.lit(' "Another quote."')).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit(' "unclosed')).otherwise(F.lit("")),
    )
    return quote_density(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "n_quotes", "quoted_chars", "quote_char_ratio"
    )


def _q_outlink_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-quality signal (urls.outlink_quality): broadcast-join
    page outlink domains to a domain-score table (a/b domains scored,
    c domains unscored — exercises the left-join NULL path), then
    per-page mean/min over scored neighbors."""
    from pdf_to_epub_spark.operators import outlink_quality

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://p"), i.cast("string"), F.lit(".example/x"))
    targets = F.array(
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://b"), (i % 3).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/")),
    )
    outlinks = d.select(url.alias("url"), F.explode(targets).alias("target"))
    scores = (
        d.select(
            F.concat(F.lit("a"), (i % 5).cast("string"), F.lit(".example"))
            .alias("domain"),
            ((i % 5).cast("double") / F.lit(10.0)).alias("score"),
        )
        .union(
            d.select(
                F.concat(F.lit("b"), (i % 3).cast("string"), F.lit(".example")),
                (i % 3).cast("double") * F.lit(0.2) + F.lit(0.05),
            )
        )
        .distinct()
    )
    return outlink_quality(outlinks, scores).select(
        "url", "n_outlinks", "n_scored", "mean_score", "min_score"
    )


def _q_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (urls.redirect_chains): pointer-doubling
    over deterministic decade chains — every doc i links u{i}->u{i+1}
    within its decade, every 5th decade closes into a 10-cycle (hop-cap
    16, unresolved), the rest terminate.  The oracle walks the same
    chains step-by-step with a recursive CTE capped at 16 hops."""
    from pdf_to_epub_spark.operators import redirect_chains

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    dst_i = F.when(i % 10 != 9, i + 1).otherwise(i - 9)
    edges = d.filter(
        (i % 10 != 9) | ((i % 10 == 9) & (F.floor(i / 10) % 5 == 0))
    ).select(
        F.concat(F.lit("u"), i.cast("string")).alias("src"),
        F.concat(F.lit("u"), dst_i.cast("string")).alias("dst"),
    )
    return redirect_chains(edges, max_hops=16).select(
        "src", "final", "hops", "resolved"
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample, Efraimidis–Spirakis with md5-derived
    uniforms, k=25): top-k by 6-dp-rounded ln(u)/w with an id
    tie-break — retry-stable and exactly replayable in SQL."""
    from pdf_to_epub_spark.operators import weighted_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("doc_id") % 7) + 1).cast("double").alias("weight")
    )
    return weighted_sample(d, k=25).select(
        "doc_id", "weight", "priority", "rank"
    )


def _q_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit (sampling.partition_skew) over a
    deliberately skewed key (source || a doc_id residue class that
    collapses most rows onto one value) — max/mean straggler ratio and
    CV from exact integer sums."""
    from pdf_to_epub_spark.operators import partition_skew

    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.col("source"),
            F.lit(":"),
            F.when(F.col("doc_id") % 10 < 7, F.lit("hot"))
            .otherwise((F.col("doc_id") % 10).cast("string")),
        ).alias("skewkey")
    )
    return partition_skew(d, "skewkey", n_buckets=16).select(
        "n_buckets", "n_rows", "n_empty", "max_bucket_rows",
        "skew_ratio", "cv",
    )


def _q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length outliers (textstats.length_outliers):
    median/MAD flagging with the z computed on the 6-dp-rounded MAD —
    doc lengths inflated for a residue class so true outliers exist."""
    from pdf_to_epub_spark.operators import length_outliers

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.when(
            F.col("doc_id") % 97 == 0, F.col("n_chars") * 50
        ).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    return length_outliers(d).select(
        "doc_id", "lang", "n_chars", "robust_z", "is_outlier"
    )


def _q_domain_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (urls.domain_triangles) over a circulant domain
    graph (node i%12 links to i%12 + 1..4) — the degree-ordered
    node-iterator; the oracle counts the same triangles with an
    INDEPENDENT canonical triple-join."""
    from pdf_to_epub_spark.operators import domain_triangles

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    edges = d.select(
        F.concat(F.lit("d"), (i % 12).cast("string")).alias("src"),
        F.concat(
            F.lit("d"), ((i % 12 + 1 + i % 4) % 12).cast("string")
        ).alias("dst"),
    )
    return domain_triangles(edges).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles", "global_clustering"
    )


def _q_range_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join enrichment (asof.range_enrich): values land in
    residue-derived [k*100, k*100+49] bands plus one overlapping 'wide'
    band — the grid-cell broadcast equi-join form; smallest-lo wins on
    overlap, NULL in the gaps."""
    from pdf_to_epub_spark.operators import range_enrich

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    vals = d.select(
        i.alias("id"), ((i * 37) % 1000).cast("long").alias("v")
    )
    ranges = (
        d.select(
            ((i % 10) * 100).cast("long").alias("lo"),
            ((i % 10) * 100 + 49).cast("long").alias("hi"),
            F.concat(F.lit("r"), (i % 10).cast("string")).alias("label"),
        )
        .union(
            d.select(
                F.lit(25).cast("long"),
                F.lit(125).cast("long"),
                F.lit("wide"),
            )
        )
        .distinct()
    )
    return range_enrich(vals, ranges, cell=64).select(
        "id", "v", "range_label"
    )


def _q_signal_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal correlation matrix (textstats.signal_correlations) over
    (n_chars, letter-run word count, a constant) — one aggregate row
    fans out to the pair rows; the constant column exercises the
    zero-variance NULL branch."""
    from pdf_to_epub_spark.operators import signal_correlations

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+', 0))"
        ).alias("n_words"),
        F.lit(7).alias("n_const"),
    )
    return signal_correlations(
        d, signal_cols=("n_chars", "n_words", "n_const")
    ).select("signal_a", "signal_b", "r")


def _q_corpus_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative ingest growth (analytics.corpus_growth): per-day
    counts with running total and running share — cumulative and
    grand-total window frames over the day-grain table."""
    from pdf_to_epub_spark.operators import corpus_growth

    e = _t(spark, sf_dir, "events")
    return corpus_growth(e).select(
        "bucket_epoch", "n_events", "cum_events", "pct_of_total"
    )


def _q_markup_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup spam profile (urls.markup_signals) over residue-built
    pages (varying script/iframe/form/anchor counts) — pure
    regexp_count column algebra; the oracle replays the same RE2
    patterns over the same constructed text in DuckDB."""
    from pdf_to_epub_spark.operators import markup_signals

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    html = F.encode(
        F.concat(
            F.lit("<html><body>"),
            F.expr("repeat('<script src=x></script>', cast(doc_id % 4 as int))"),
            F.expr("repeat('<iframe>', cast(doc_id % 3 as int))"),
            F.when(i % 5 == 0, F.lit("<form action=/s>")).otherwise(F.lit("")),
            F.expr("repeat('<a href=x>t</a>', cast(doc_id % 6 as int))"),
            F.expr("repeat('plain text ', cast(doc_id % 7 as int) + 1)"),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("m://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return markup_signals(pages).select(
        "url", "n_script", "n_iframe", "n_form", "n_links", "tag_density"
    )


def _q_meta_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-side refresh extraction (urls.meta_redirects) over five
    residue variants (quoted, reversed-attr/upper-URL, no-url reload,
    absent, duplicate-first-wins) — construction oracle."""
    from pdf_to_epub_spark.operators import meta_redirects

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    meta = (
        F.when(i % 5 == 0, F.concat(
            F.lit('<meta http-equiv="refresh" content="5; url=https://t.example/a'),
            i.cast("string"), F.lit('">')))
        .when(i % 5 == 1, F.concat(
            F.lit("<meta content='0;URL=/next"), i.cast("string"),
            F.lit("' http-equiv=refresh>")))
        .when(i % 5 == 2, F.lit('<meta http-equiv="refresh" content="30">'))
        .when(i % 5 == 3, F.lit('<meta name="viewport" content="width=1">'))
        .otherwise(F.concat(
            F.lit('<meta http-equiv=refresh content="1;url=first'),
            i.cast("string"),
            F.lit('"><meta http-equiv="refresh" content="9;url=second">')))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), meta, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("r://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return meta_redirects(pages).select("url", "delay_s", "target")


def _q_rel_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination-hint extraction (urls.rel_pagination) over four
    residue variants (next-only, multi-token prev with reversed attrs,
    both + duplicate-first-wins, stylesheet-only) — construction
    oracle."""
    from pdf_to_epub_spark.operators import rel_pagination

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    links = (
        F.when(i % 4 == 0, F.concat(
            F.lit('<link rel="next" href="https://s.example/p'),
            (i + 1).cast("string"), F.lit('">')))
        .when(i % 4 == 1, F.concat(
            F.lit("<link href='/p"), (i - 1).cast("string"),
            F.lit("' rel='prev nofollow'>")))
        .when(i % 4 == 2, F.concat(
            F.lit("<link rel=next href=/n"), i.cast("string"),
            F.lit("><link rel=prev href=/p"), i.cast("string"),
            F.lit('><link rel="next" href="/dup">')))
        .otherwise(F.lit('<link rel="stylesheet" href="/css">'))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), links, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("g://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return rel_pagination(pages).select(
        "url", "next_url", "prev_url", "is_paginated"
    )


def _q_og_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph / Twitter-card extraction (urls.og_cards) over four
    residue variants (full set with a duplicate og:title whose FIRST
    declaration wins, reversed single-quoted attrs with spaces in the
    value, unquoted twitter-only, none) — construction oracle."""
    from pdf_to_epub_spark.operators import og_cards

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    metas = (
        F.when(i % 4 == 0, F.concat(
            F.lit('<meta property="og:title" content="First '),
            i.cast("string"),
            F.lit('"><meta property="og:title" content="Second">'
                  '<meta property="og:type" content="article">'
                  '<meta property="og:image" content="https://img.example/'),
            i.cast("string"),
            F.lit('.jpg"><meta name="twitter:card" content="summary_large_image">')))
        .when(i % 4 == 1, F.concat(
            F.lit("<meta content='Title "), i.cast("string"),
            F.lit(" here' property='og:title'>")))
        .when(i % 4 == 2, F.lit(
            "<meta name=twitter:card content=summary>"))
        .otherwise(F.lit('<meta charset="utf-8">'))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), metas, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("o://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return og_cards(pages).select(
        "url", "og_title", "og_type", "og_image", "twitter_card"
    )


def _q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (urls.k_core, k=3) over a circulant C20{1,2} core
    (degree 4 everywhere) dressed with two-hop pendant chains
    (q_j - p_j, p_j - c_j, p_j - c_{j+1}) — the q nodes peel in round
    one, which drops p below k in round two: a genuine cascade.  The
    construction oracle is the surviving core with its degrees."""
    from pdf_to_epub_spark.operators import k_core

    d = _t(spark, sf_dir, "documents").select("doc_id")
    j = (F.col("doc_id") % 20).cast("string")
    j1 = ((F.col("doc_id") % 20 + 1) % 20).cast("string")
    j2 = ((F.col("doc_id") % 20 + 2) % 20).cast("string")
    c, c1, c2 = (
        F.concat(F.lit("c"), j),
        F.concat(F.lit("c"), j1),
        F.concat(F.lit("c"), j2),
    )
    p, q = F.concat(F.lit("p"), j), F.concat(F.lit("q"), j)
    edges = (
        d.select(c.alias("src"), c1.alias("dst"))
        .union(d.select(c, c2))
        .union(d.select(p, c))
        .union(d.select(p, c1))
        .union(d.select(q, p))
    )
    return k_core(edges, k=3).select("node", "deg")


def _q_client_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: meta-refresh extraction feeding pointer-doubling
    chain resolution — pages u{i} declare a refresh to u{i+1} within
    their decade, every 5th decade closes into a 10-cycle, the rest
    terminate.  Extraction bugs and resolution bugs both break the
    recursive-CTE oracle."""
    from pdf_to_epub_spark.operators import meta_redirects, redirect_chains

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    dst_i = F.when(i % 10 != 9, i + 1).otherwise(i - 9)
    refresh = F.when(
        (i % 10 != 9) | ((i % 10 == 9) & (F.floor(i / 10) % 5 == 0)),
        F.concat(
            F.lit('<meta http-equiv="refresh" content="0; url=u'),
            dst_i.cast("string"), F.lit('">'),
        ),
    ).otherwise(F.lit("<meta charset=utf-8>"))
    html = F.encode(
        F.concat(F.lit("<html><head>"), refresh,
                 F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("u"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    edges = meta_redirects(pages).select(
        F.col("url").alias("src"), F.col("target").alias("dst")
    )
    return redirect_chains(edges, max_hops=16).select(
        "src", "final", "hops", "resolved"
    )


def _q_cluster_pair_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-counting dedup-cluster evaluation (evaluate.cluster_pair_eval):
    predicted clusters mostly match the residue-class truth with a
    deterministic error minority (every 11th doc shifts one class) —
    exact integer C(n,2) sums, 6-dp divisions."""
    from pdf_to_epub_spark.operators import cluster_pair_eval

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    a = d.select(
        ((i + F.when(i % 11 == 0, 1).otherwise(0)) % 6).alias("pred"),
        (i % 6).alias("truth"),
    )
    return cluster_pair_eval(a).select(
        "n_items", "tp_pairs", "pred_pairs", "true_pairs",
        "precision", "recall", "f1",
    )


def _rater_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-rater annotation run over the documents table:
    the true label is doc_id%3, rater r flips to the next label on every
    (doc_id+r)%5 == 0 item, and rater r2 skips doc_id%7 == 0 items —
    variable raters-per-item, skewed-but-agreeing marginals (the regime
    where raw agreement overstates reliability)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    r = F.col("r")
    return (
        d.select(i, F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"))
        .where(~((r == 2) & (i % 7 == 0)))
        .select(
            i.alias("item_id"),
            F.concat(F.lit("r"), r.cast("string")).alias("rater"),
            F.concat(
                F.lit("L"),
                (
                    (i % 3 + F.when((i + r) % 5 == 0, 1).otherwise(0)) % 3
                ).cast("string"),
            ).alias("label"),
        )
    )


def _q_rater_kappa_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per rater pair (evaluate.cohen_kappa_pairs) over the
    deterministic 3-rater run — chance-corrected agreement cleared of
    fractions, so both sides of the single 6-dp division are exact
    integers (kappa = (n·agree − Σ a_l·b_l)/(n² − Σ a_l·b_l))."""
    from pdf_to_epub_spark.operators import cohen_kappa_pairs

    return cohen_kappa_pairs(_rater_table(spark, sf_dir)).select(
        "rater_a", "rater_b", "n_items", "n_agree", "po", "pe", "kappa"
    )


def _q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (evaluate.fleiss_kappa) over the same 3-rater run —
    variable raters-per-item handled by excluding n_i<2 items; per-item
    agreement nano-quantized with exact integral `div` so the mean is
    order-independent and SQL-replayable."""
    from pdf_to_epub_spark.operators import fleiss_kappa

    return fleiss_kappa(_rater_table(spark, sf_dir)).select(
        "n_items", "n_ratings", "p_bar", "p_e", "kappa"
    )


def _routing_payload(doc_id: int) -> bytes | None:
    """Deterministic mixed-container payload per doc_id (shared by the
    Spark query's generator and the oracle replica): all eight detected
    classes plus empty/NULL, content a pure function of the id."""
    import gzip as _gzip

    from pdf_to_epub_spark.export import epub_bytes
    from pdf_to_epub_spark.sources.docx import make_docx_bytes
    from pdf_to_epub_spark.sources.pdf import make_pdf_bytes

    k = doc_id % 10
    if k == 0:
        return make_pdf_bytes([[(72.0, 700.0, 12.0, f"doc {doc_id}")]])
    if k == 1:
        return epub_bytes([], title=f"doc {doc_id}", url=f"doc://{doc_id}")
    if k == 2:
        return make_docx_bytes(doc_id, f"doc {doc_id}")
    if k == 3:
        return b"{\\rtf1\\ansi doc %d}" % doc_id
    if k == 4:
        return _gzip.compress(b"doc %d" % doc_id, mtime=0)
    if k == 5:
        return b"  <html><body>doc %d</body></html>" % doc_id
    if k == 6:
        return b"\xef\xbb\xbf<?xml version='1.0'?><d i='%d'/>" % doc_id
    if k == 7:
        return b"plain text doc %d\n" % doc_id
    if k == 8:
        return bytes([doc_id % 7, 0x01, 0xFE]) + b"%d" % doc_id
    return b"" if doc_id % 2 == 0 else None


def _q_payload_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-door container dispatch (extract.route_payloads /
    sniff_document): a deterministic mixed store — real PDF / EPUB /
    OOXML / RTF / gzip / HTML / XML / text / binary / empty payloads,
    one class per doc_id residue — routed by JVM-side magic-byte
    column algebra (no Python, no shuffle).  The oracle replays
    `py_sniff_document` over the same generated bytes into a VALUES
    table keyed by the corpus."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.extract import route_payloads

    docs = _t(spark, sf_dir, "documents").where("doc_id < 200").select(
        "doc_id"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_routing_payload(i) for i in ids]}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return route_payloads(payloads).select(
        "doc_id",
        "detected",
        F.coalesce(F.length("payload"), F.lit(-1)).cast("int").alias(
            "n_bytes"
        ),
    )


def _payload_routing_oracle(limit: int = 200) -> str | None:
    """VALUES oracle for `payload_routing`: the pure-Python sniffer
    replica (`py_sniff_document`, kept bit-for-bit with the JVM
    when-chain) over the same deterministic payloads."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.extract import py_sniff_document

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text"])
        recs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        for doc_id, _ in recs:
            if doc_id >= limit:
                continue
            p = _routing_payload(doc_id)
            rows.append(
                f"('{key}',{doc_id},'{py_sniff_document(p)}',"
                f"{len(p) if p is not None else -1})"
            )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, doc_id, detected, n_bytes) AS (VALUES
            {vals})
        SELECT doc_id::BIGINT AS doc_id, detected, n_bytes::INT AS n_bytes
        FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents
                            WHERE doc_id = 0)
    """


def _isotonic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic noisy-monotone calibration set: score is the doc's
    percent residue, the label fires when a hash residue clears a
    score-proportional threshold — so bin means mostly rise but violate
    monotonicity locally (the shape PAV exists to pool)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    return d.select(
        F.concat(F.lit("src"), (i % 2).cast("string")).alias("source"),
        ((i % 100) / F.lit(100.0)).alias("score"),
        (
            (i * 7919) % 100
            < 15 + F.expr("CAST((doc_id % 100) * 7 div 10 AS INT)")
        ).alias("label"),
    )


def _q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration table (classify.isotonic_calibration,
    20 bins, per source): exact integer-weight violator pooling over the
    one (group, bin) corpus aggregation.  The oracle derives the same
    fit via the greatest-convex-minorant slopes of the cumulative
    (Σn, Σn_pos) diagram — an independent algorithm, provably equal to
    PAV — precomputed into a VALUES table per corpus."""
    from pdf_to_epub_spark.operators import isotonic_calibration

    return isotonic_calibration(
        _isotonic_table(spark, sf_dir), group_col="source", bins=20
    ).select("source", "bin", "score_lo", "score_hi", "n", "n_pos", "p_cal")


def _isotonic_oracle(bins: int = 20) -> str | None:
    """VALUES-table oracle for `isotonic_calibration`, computed with the
    GCM/convex-hull characterization (NOT the operator's PAV merge):
    fitted value per bin = slope of the lower convex hull segment of the
    cumulative (Σn, Σn_pos) diagram covering that bin."""
    import hashlib

    import pyarrow.parquet as pq

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text"])
        recs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        by_group: dict[str, dict[int, list[int]]] = {}
        for doc_id, _ in recs:
            g = f"src{doc_id % 2}"
            score = (doc_id % 100) / 100.0
            label = (doc_id * 7919) % 100 < 15 + ((doc_id % 100) * 7) // 10
            b = min(max(int(score * bins), 0), bins - 1)
            cell = by_group.setdefault(g, {}).setdefault(b, [0, 0])
            cell[0] += 1
            cell[1] += 1 if label else 0
        for g in sorted(by_group):
            bd = by_group[g]
            order = sorted(bd)
            pts = [(0, 0)]
            cx = cy = 0
            for b in order:
                cx += bd[b][0]
                cy += bd[b][1]
                pts.append((cx, cy))
            hull: list[tuple[int, int]] = []
            for pt in pts:
                while len(hull) >= 2:
                    (x1, y1), (x2, y2) = hull[-2], hull[-1]
                    if (x2 - x1) * (pt[1] - y1) <= (pt[0] - x1) * (y2 - y1):
                        hull.pop()
                    else:
                        break
                hull.append(pt)
            seg = 0
            cx = 0
            for b in order:
                n, pos = bd[b]
                cx += n
                while seg + 1 < len(hull) and hull[seg + 1][0] < cx:
                    seg += 1
                (x1, y1), (x2, y2) = hull[seg], hull[seg + 1]
                p_cal = round((y2 - y1) / (x2 - x1), 6)
                rows.append(
                    f"('{key}','{g}',{b},{b / bins!r},{(b + 1) / bins!r},"
                    f"{n},{pos},{p_cal!r})"
                )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, source, bin, score_lo, score_hi, n,
                    n_pos, p_cal) AS (VALUES
            {vals})
        SELECT source, bin::INT AS bin, score_lo::DOUBLE AS score_lo,
               score_hi::DOUBLE AS score_hi, n::BIGINT AS n,
               n_pos::BIGINT AS n_pos, p_cal::DOUBLE AS p_cal
        FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents
                            WHERE doc_id = 0)
    """


def _q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table (ir.negative_sampling_table,
    5000 slots over the top-200 vocab): unigram^0.75 computed as
    sqrt(sqrt(n³)) — IEEE-correctly-rounded in both engines, unlike
    libm pow — micro-floor-quantized, then exact largest-remainder
    apportionment (allocations sum to exactly 5000)."""
    from pdf_to_epub_spark.operators.ir import negative_sampling_table

    d = _t(spark, sf_dir, "documents").select("text")
    return negative_sampling_table(d, table_size=5000, k=200).select(
        "word", "n", "w_micro", "slots"
    )
