"""Oracle SQL builder helpers (mechanical __spark_entry__ split; verbatim)."""
from __future__ import annotations

import pathlib
from entry._shared import _vec_lit
from entry.queries_03 import _MOJI_TAIL, _OCR_TAIL


def _gate_oracle(final_select: str) -> str:
    """DuckDB replica of the access-gate fixture + signals: the marker
    regex lists come straight from operators/gates.py so the Spark and
    oracle sides cannot drift; ``final_select`` runs over the shared
    ``sig`` CTE of per-page counts."""
    from pdf_to_epub_spark.operators.gates import (
        CONSENT_MARKERS,
        PAYWALL_MARKERS,
    )

    pw = " + ".join(
        f"len(regexp_extract_all(lt, '{p}'))" for p in PAYWALL_MARKERS
    )
    cs = " + ".join(
        f"len(regexp_extract_all(lt, '{p}'))" for p in CONSENT_MARKERS
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS tk,
                   coalesce(text, '') AS orig
            FROM documents
        ), base AS (
            SELECT doc_id, 'd' || (doc_id % 7) AS domain,
                   CASE WHEN doc_id % 7 = 3 THEN
                       array_to_string(list_slice(tk, 1, 25), ' ')
                       || ' Subscribe to continue reading.'
                       || ' Already a subscriber? Sign in.'
                       || ' Unlock unlimited digital access.'
                   WHEN doc_id % 7 = 1 THEN
                       'We value your privacy. We and our partners use'
                       || ' cookies. Accept all cookies or manage your'
                       || ' preferences. ' || orig
                   ELSE orig END AS text
            FROM toks
        ), lowered AS (
            SELECT doc_id, domain, text, lower(text) AS lt FROM base
        ), sig AS (
            SELECT doc_id, domain,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
                   ({pw})::BIGINT AS paywall_hits,
                   ({cs})::BIGINT AS consent_hits
            FROM lowered
        )
        {final_select}
    """


def _texttiling_oracle(final_select: str) -> str:
    """DuckDB replica of operators/segment.py (w=10, k=2): pseudo-
    sentence term counts (grouped by the term STRING — the Spark side's
    64-bit hash is equality-only, exact up to 2⁻⁶⁴ collisions), full-
    window gaps only, integer micro-Dice, local-valley depth, cross-
    multiplied at-or-above-mean boundary rule.  ``final_select`` runs
    over the ``scored`` (gaps) and ``np`` (doc lengths) CTEs."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), tok AS (
            SELECT doc_id, (i - 1) // 10 AS ps, lower(toks[i]) AS term
            FROM t, unnest(generate_series(1, len(toks))) AS u(i)
        ), pc AS (
            SELECT doc_id, ps, term, count(*)::BIGINT AS cnt
            FROM tok GROUP BY doc_id, ps, term
        ), np AS (
            SELECT doc_id, max(ps) + 1 AS n_ps FROM pc GROUP BY doc_id
        ), contrib AS (
            SELECT pc.doc_id, g.gap, term, cnt AS cl, 0::BIGINT AS cr
            FROM pc JOIN np USING (doc_id),
                 unnest(generate_series(greatest(ps + 1, 2),
                                        least(ps + 2, n_ps - 2))) AS g(gap)
            WHERE greatest(ps + 1, 2) <= least(ps + 2, n_ps - 2)
            UNION ALL
            SELECT pc.doc_id, g.gap, term, 0::BIGINT, cnt
            FROM pc JOIN np USING (doc_id),
                 unnest(generate_series(greatest(ps - 1, 2),
                                        least(ps, n_ps - 2))) AS g(gap)
            WHERE greatest(ps - 1, 2) <= least(ps, n_ps - 2)
        ), per_term AS (
            SELECT doc_id, gap, term,
                   sum(cl) AS cl, sum(cr) AS cr
            FROM contrib GROUP BY doc_id, gap, term
        ), per_gap AS (
            SELECT doc_id, gap,
                   sum(least(cl, cr)) AS inter,
                   sum(cl) + sum(cr) AS total
            FROM per_term GROUP BY doc_id, gap
        ), sims AS (
            SELECT doc_id, gap,
                   (2000000 * inter) // total AS sim_micro
            FROM per_gap
        ), depths AS (
            SELECT doc_id, gap, sim_micro,
                   greatest(coalesce(
                       lag(sim_micro) OVER w - sim_micro, 0), 0)
                   + greatest(coalesce(
                       lead(sim_micro) OVER w - sim_micro, 0), 0)
                       AS depth_micro
            FROM sims WINDOW w AS (PARTITION BY doc_id ORDER BY gap)
        ), scored AS (
            SELECT doc_id, gap, sim_micro, depth_micro,
                   (depth_micro > 0 AND
                    depth_micro * (count(*) OVER d)
                        >= (sum(depth_micro) OVER d)) AS is_boundary
            FROM depths WINDOW d AS (PARTITION BY doc_id)
        )
        {final_select}
    """


def _subtitle_oracle(final_select: str) -> str:
    """DuckDB replica of the subtitle fixture derivation
    (sources/subtitles.py constants: 8-token cues, 2.5 s pitch, 5 s
    silence before every 10th cue): ``final_select`` runs over the
    ``cu`` CTE of per-cue token slices."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) + 7) // 8 - 1))
                       AS cue
            FROM t WHERE len(toks) >= 1
        ), cu AS (
            SELECT doc_id, cue,
                   list_slice(toks, cue * 8 + 1, cue * 8 + 8) AS ct
            FROM c
        )
        {final_select}
    """


def _mbox_oracle(final_select: str) -> str:
    """DuckDB replica of the mbox fixture derivation (sources/mbox.py
    constants: 50-token messages, 10-token body lines, 'From the desk…'
    openers, Re:-chained subjects): ``final_select`` runs over the
    ``msgs`` CTE of per-message (m, subject, n_quoted, body) rows."""
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), n AS (
            SELECT doc_id, toks,
                   greatest((len(toks) + 49) // 50, 1) AS nm
            FROM d
        ), ms AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, nm - 1)) AS m
            FROM n
        ), ch AS (
            SELECT doc_id, m,
                   list_slice(toks, m * 50 + 1, m * 50 + 50) AS chunk
            FROM ms
        ), lj AS (
            SELECT doc_id, m, u.j,
                   array_to_string(
                       list_slice(chunk, u.j * 10 + 1, u.j * 10 + 10),
                       ' ') AS line
            FROM ch,
                 unnest(generate_series(0, (len(chunk) + 9) // 10 - 1))
                     AS u(j)
            WHERE len(chunk) > 0
        ), bodies AS (
            SELECT doc_id, m,
                   string_agg(line, chr(10) ORDER BY j) AS rest
            FROM lj GROUP BY doc_id, m
        ), msgs AS (
            SELECT ch.doc_id, ch.m,
                   CASE WHEN ch.m = 0 THEN 'Thread ' || ch.doc_id
                        ELSE 'Re: Thread ' || ch.doc_id END AS subject,
                   CASE WHEN ch.m = 0 THEN 0 ELSE 1 END AS n_quoted,
                   'From the desk of user ' || ch.m ||
                   CASE WHEN b.rest IS NULL THEN ''
                        ELSE chr(10) || b.rest END AS body
            FROM ch LEFT JOIN bodies b USING (doc_id, m)
        )
        {final_select}
    """


def _sedump_oracle(final_select: str) -> str:
    """DuckDB replica of the Stack-Exchange dump derivation
    (sources/sedump.py constants: 40-token posts, 8-token body lines,
    the 'A & B <c> "m"' opener, scores ``doc_id % 5`` for the question
    and ``(doc_id + 3·m) % 7 − 1`` for answer ordinal m, accepted =
    argmax(score, −m)): ``final_select`` runs over the ``posts`` CTE of
    (doc_id, post_id, post_type, parent_id, accepted_id, score, title,
    body, np, m) rows."""
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), n AS (
            SELECT doc_id, toks,
                   greatest((len(toks) + 39) // 40, 2) AS np
            FROM d
        ), ms AS (
            SELECT doc_id, toks, np,
                   unnest(generate_series(0, np - 1)) AS m
            FROM n
        ), ch AS (
            SELECT doc_id, np, m,
                   list_slice(toks, m * 40 + 1, m * 40 + 40) AS chunk
            FROM ms
        ), lj AS (
            SELECT doc_id, m, u.j,
                   array_to_string(
                       list_slice(chunk, u.j * 8 + 1, u.j * 8 + 8),
                       ' ') AS line
            FROM ch,
                 unnest(generate_series(0, (len(chunk) + 7) // 8 - 1))
                     AS u(j)
            WHERE len(chunk) > 0
        ), bodies AS (
            SELECT doc_id, m,
                   string_agg(line, chr(10) ORDER BY j) AS rest
            FROM lj GROUP BY doc_id, m
        ), pm AS (
            SELECT ch.doc_id, ch.np, ch.m,
                   'A & B <c> "' || ch.m || '"' ||
                   CASE WHEN b.rest IS NULL THEN ''
                        ELSE chr(10) || b.rest END AS body,
                   CASE WHEN ch.m = 0 THEN ch.doc_id % 5
                        ELSE (ch.doc_id + 3 * ch.m) % 7 - 1 END AS score
            FROM ch LEFT JOIN bodies b USING (doc_id, m)
        ), best AS (
            SELECT doc_id, m AS best_m,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, m ASC) AS rn
            FROM pm WHERE m > 0
        ), posts AS (
            SELECT pm.doc_id,
                   (pm.m + 1)::BIGINT AS post_id,
                   (CASE WHEN pm.m = 0 THEN 1 ELSE 2 END)::BIGINT
                       AS post_type,
                   (CASE WHEN pm.m = 0 THEN NULL ELSE 1 END)::BIGINT
                       AS parent_id,
                   (CASE WHEN pm.m = 0 THEN b.best_m + 1
                         ELSE NULL END)::BIGINT AS accepted_id,
                   pm.score::BIGINT AS score,
                   CASE WHEN pm.m = 0 THEN 'Question ' || pm.doc_id
                        ELSE NULL END AS title,
                   pm.body, pm.np, pm.m
            FROM pm LEFT JOIN (
                SELECT doc_id, best_m FROM best WHERE rn = 1
            ) b USING (doc_id)
        )
        {final_select}
    """


def _shingle_jaccard_oracle(k: int, threshold: float, final: str | None = None) -> str:
    """DuckDB replica of the mutated-recrawl shingle-Jaccard queries: exact
    k-word-shingle Jaccard over documents ∪ last-word-dropped copies.

    Shingle semantics mirror operators/dedup.py `_shingles_from_tokens` exactly:
    split(trim(lower(text)), '\\s+'), distinct k-grams joined by ' ', whole
    text as the single shingle when fewer than k tokens.  The min/max size
    prefilter is sound (J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)), it just prunes
    the quadratic pair scan.

    ``final`` overrides the closing SELECT (receives a ``truepairs`` CTE
    with id_a/id_b/jaccard and the ``corpus`` CTE) — used by the survivor
    oracle for the near-dup removal query."""
    final = final or """
        SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM truepairs
    """
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                CASE WHEN len(toks) >= {k} THEN
                    list_distinct(list_transform(
                        generate_series(1, len(toks)-{k}+1),
                        i -> array_to_string(list_slice(toks, i, i+{k}-1), ' ')))
                ELSE [array_to_string(toks, ' ')] END AS shingles
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                  FROM corpus)
        ),
        sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
        truepairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.shingles, b.shingles))::DOUBLE
                   / (a.n + b.n - len(list_intersect(a.shingles, b.shingles)))
                   AS jaccard
            FROM sized a JOIN sized b
              ON a.doc_id < b.doc_id
             AND least(a.n, b.n)::DOUBLE / greatest(a.n, b.n) >= {threshold}
            WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / (a.n + b.n - len(list_intersect(a.shingles, b.shingles)))
                  >= {threshold}
        )
        {final}
    """


def _extraction_golden_values() -> str | None:
    """Inline-VALUES form of tests/golden/extraction_golden.parquet (the
    reference-pipeline Step3 hashes; see tests/make_extraction_goldens.py).
    Inlined rather than read_parquet'd so the oracle works regardless of
    the driver's DuckDB file-access configuration; the corpus_key column
    (md5 of doc 0's text) lets one oracle serve both sf corpora, which
    share doc_ids but not texts."""
    import pyarrow.parquet as pq

    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tests" / "golden" / "extraction_golden.parquet"
    )
    if not path.exists():
        return None
    t = pq.read_table(path)
    return ",\n            ".join(
        f"('{ck}','{url}','{sha}',{n})"
        for ck, url, sha, n in zip(
            t["corpus_key"].to_pylist(),
            t["url"].to_pylist(),
            t["text_sha"].to_pylist(),
            t["n_chars"].to_pylist(),
        )
    )


def _extraction_oracles() -> dict[str, str]:
    vals = _extraction_golden_values()
    if vals is None:  # goldens not generated: queries fall back to rows-only
        return {}
    base = f"""
        WITH golden(corpus_key, url, text_sha, n_chars) AS (VALUES
            {vals}),
        matched AS (
            SELECT url, text_sha, n_chars::BIGINT AS n_chars FROM golden
            WHERE corpus_key = (SELECT md5(text) FROM documents WHERE doc_id = 0)
        )
    """
    oracles = {
        "assemble_documents": base + "SELECT url, text_sha, n_chars FROM matched",
        # binary wrap → pandas-UDF decode → extract must be byte-transparent
        "binary_decode_extract": base + "SELECT url, text_sha, n_chars FROM matched",
        "extract_blocks": base
        + """SELECT url, text_sha, n_chars,
                    0::BIGINT AS span_gap, 0::BIGINT AS first_span
             FROM matched""",
    }

    cpath = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tests" / "golden" / "extraction_counters_golden.parquet"
    )
    if cpath.exists():
        import pyarrow.parquet as pq

        t = pq.read_table(cpath)
        cvals = ",\n            ".join(
            f"('{ck}','{counter}',{total})"
            for ck, counter, total in zip(
                t["corpus_key"].to_pylist(),
                t["counter"].to_pylist(),
                t["total"].to_pylist(),
            )
        )
        oracles["extraction_metrics"] = f"""
            WITH golden(corpus_key, counter, total) AS (VALUES
                {cvals})
            SELECT counter, total::BIGINT AS total FROM golden
            WHERE corpus_key = (SELECT md5(text) FROM documents WHERE doc_id = 0)
        """
    return oracles


def _media_features_oracle(n: int = 200) -> str:
    """Golden-VALUES oracle for the multimodal decode query: the corpus is
    deterministic (make_media_corpus(seed=7)), so the expected
    (container, n_bytes, width, height, n_frames, status) per media_id is
    computed ONCE here with the pure stdlib codecs (no Spark) and inlined —
    the same pattern as the reference-pipeline extraction goldens.  The
    Python sniffing below replicates the JVM-side magic-byte when-chain in
    operators/multimodal.sniff_container bit-for-bit (same _MAGIC order,
    same ftyp-at-offset-5 mp4 rule)."""
    from pdf_to_epub_spark.functions.mediacodec import UnsupportedMedia
    from pdf_to_epub_spark.operators.multimodal import (
        decode_media,
        make_media_corpus,
        py_sniff_container as sniff,
    )

    rows = []
    for r in make_media_corpus(n):
        raw = r["payload"]
        container = sniff(raw)
        try:
            feat = decode_media(raw, container)
            w, h, nf, status = feat["width"], feat["height"], feat["n_frames"], "ok"
        except UnsupportedMedia:
            w = h = nf = None
            status = "unsupported"
        sql_int = lambda v: "NULL" if v is None else str(v)  # noqa: E731
        rows.append(
            f"({r['media_id']},'{r['media_type']}','{container}',{len(raw)},"
            f"{sql_int(w)},{sql_int(h)},{sql_int(nf)},'{status}')"
        )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(media_id, media_type, container, n_bytes, width, height,
                    n_frames, status) AS (VALUES
            {vals})
        SELECT media_id::BIGINT AS media_id, media_type, container,
               n_bytes::BIGINT AS n_bytes, width::INTEGER AS width,
               height::INTEGER AS height, n_frames::INTEGER AS n_frames,
               status
        FROM golden
    """


_GOPHER_ORACLE = r"""
            WITH w AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS words,
                       list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(l, '[^ \t\r]')) AS lines
                FROM documents),
            feats AS (
                SELECT doc_id,
                    len(words) AS n_words,
                    list_aggregate(list_transform(words, x -> length(x)),
                                   'sum')::DOUBLE
                        / greatest(len(words), 1) AS mean_wlen,
                    (length(text) - length(replace(text, '#', ''))
                     + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
                        / greatest(len(words), 1) AS symbol_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '^\s*[•\-\*]')))::DOUBLE
                        / greatest(len(lines), 1) AS bullet_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '\.\.\.\s*$')))::DOUBLE
                        / greatest(len(lines), 1) AS ellipsis_ratio,
                    len(list_filter(words,
                        x -> regexp_matches(x, '[A-Za-zÀ-ÖØ-öø-ÿ]')))::DOUBLE
                        / greatest(len(words), 1) AS alpha_ratio,
                    len(list_intersect(
                        list_distinct(regexp_extract_all(lower(text),
                                                         '[a-zà-öø-ÿ]+')),
                        ['the','be','to','of','and','that','have','with']))
                        AS stop_hits
                FROM w)
            SELECT doc_id, n_words::BIGINT AS n_words,
                   round(mean_wlen, 4) AS mean_word_len,
                   round(symbol_ratio, 4) AS symbol_ratio,
                   round(bullet_ratio, 4) AS bullet_line_ratio,
                   round(ellipsis_ratio, 4) AS ellipsis_line_ratio,
                   round(alpha_ratio, 4) AS alpha_word_ratio,
                   stop_hits::BIGINT AS stopword_hits,
                   (n_words BETWEEN 50 AND 100000
                    AND mean_wlen BETWEEN 3.0 AND 10.0
                    AND symbol_ratio < 0.1
                    AND bullet_ratio < 0.9
                    AND ellipsis_ratio < 0.3
                    AND alpha_ratio > 0.8
                    AND stop_hits >= 2) AS keep
            FROM feats
        """


_COSINE = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _lsh_topk_oracle(
    dim: int = 64, bits: int = 4, n_tables: int = 12, seed: int = 7, k: int = 10
) -> str:
    """DuckDB replica of the multi-table hyperplane LSH top-k: the SAME
    hyperplanes the Spark operator generates (similarity._hyperplanes is
    deterministic in (dim, bits, seed)) are inlined as literals, bucket
    assignment/candidate-union/exact-ranking are recomputed relationally —
    so the approximate result itself is oracle-checked, not just its
    recall."""
    from pdf_to_epub_spark.operators.similarity import _hyperplanes

    def bucket(vexpr: str, t: int) -> str:
        planes = _hyperplanes(dim, bits, seed + t)
        return " + ".join(
            f"(CASE WHEN list_dot_product({vexpr}, {_vec_lit(p)}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    cb = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS t, {bucket('v', t)} AS b FROM e"
        for t in range(n_tables)
    )
    qb = "\nUNION ALL\n".join(
        f"SELECT query_id, {t} AS t, {bucket('qv', t)} AS b FROM q"
        for t in range(n_tables)
    )
    cos = _COSINE.format(a="e.v", b="q.qv")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT qb.query_id, cb.vec_id
            FROM cb JOIN qb ON cb.t = qb.t AND cb.b = qb.b),
        scored AS (
            SELECT c.query_id, c.vec_id, {cos} AS raw
            FROM cand c
            JOIN e ON e.vec_id = c.vec_id
            JOIN q ON q.query_id = c.query_id),
        ranked AS (
            SELECT query_id, vec_id, raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY raw DESC, vec_id ASC) AS rank
            FROM scored)
        SELECT query_id, vec_id, round(raw, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def _ivf_topk_oracle(
    k: int = 10, n_centroids: int = 16, nprobe: int = 10,
    sample_size: int = 512, seed: int = 5,
) -> str | None:
    """DuckDB replica of the IVF top-k.  The coarse centroids are data-
    dependent, so they are recomputed here in plain Python with the same
    deterministic Lloyd's code over the same hash-spread 512-row sample the
    Spark operator collects (ordered by md5(str(vec_id)) — Spark
    ``md5(cast(id as string))`` sorts identically to Python
    ``hashlib.md5(str(id)).hexdigest()`` since both are lowercase-hex ASCII),
    once per testdata corpus, and inlined as a corpus-keyed VALUES table
    (key = first component of vec 0, the corpora share ids but not
    vectors).  Cell assignment, nprobe probing and exact ranking are then
    recomputed relationally."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    cos = _COSINE.format(a="e.v", b="q.qv")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, a.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        probe AS (
            SELECT query_id, cid FROM (
                SELECT q.query_id, a.cid,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_distance(q.qv, a.c), a.cid) AS rn
                FROM q CROSS JOIN acts a)
            WHERE rn <= {nprobe}),
        cand AS (
            SELECT p.query_id, c.vec_id
            FROM probe p JOIN cell c ON c.cid = p.cid),
        scored AS (
            SELECT cd.query_id, cd.vec_id, {cos} AS raw
            FROM cand cd
            JOIN e ON e.vec_id = cd.vec_id
            JOIN q ON q.query_id = cd.query_id),
        ranked AS (
            SELECT query_id, vec_id, raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY raw DESC, vec_id ASC) AS rank
            FROM scored)
        SELECT query_id, vec_id, round(raw, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def _extraction_eval_oracle() -> str:
    """DuckDB replay of the naive-strip extraction eval: page rebuild
    (constants interpolated from sources/synth so the two constructions
    cannot drift), global tag strip, tokenization, and the multiset
    P/R/F1 — NULL/zero denominators included."""
    from pdf_to_epub_spark.sources.synth import _AD, _ASIDE, _NAV

    return f"""
        WITH esc AS (
            SELECT doc_id,
                   replace(replace(replace(coalesce(text, ''),
                       '&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS t,
                   coalesce(text, '') AS raw
            FROM documents
        ), lns AS (
            SELECT doc_id, raw,
                   list_filter(string_split(t, chr(10)),
                               x -> regexp_matches(x, '[^ \\t\\r]')) AS ls
            FROM esc
        ), pg AS (
            SELECT doc_id, raw,
                   '<html><head><title>doc://' || doc_id ||
                   '</title></head><body>{_NAV}<header><p>Crawl header ' ||
                   doc_id || '</p></header><h1>Document ' || doc_id ||
                   '</h1>' ||
                   array_to_string(list_transform(generate_series(1, len(ls)),
                       i -> '<p>' || ls[i] || '</p>' ||
                            CASE WHEN (i - 1) % 4 = 2
                                 THEN '{_AD}' ELSE '' END), '') ||
                   '{_ASIDE}<footer><p>(c) 2025 crawl.invalid ' || doc_id ||
                   '</p></footer></body></html>' AS page
            FROM lns
        ), tagged AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(
                       regexp_replace(page, '<[^>]*>', ' ', 'g')),
                       '[a-zà-öø-ÿ]+')) AS tok,
                   1 AS is_pred
            FROM pg
            UNION ALL
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(
                       'Document' || chr(10) || raw), '[a-zà-öø-ÿ]+')) AS tok,
                   0 AS is_pred
            FROM pg
        ), pertok AS (
            SELECT doc_id, tok,
                   sum(CASE WHEN is_pred = 1 THEN 1 ELSE 0 END) AS c_p,
                   sum(CASE WHEN is_pred = 0 THEN 1 ELSE 0 END) AS c_g
            FROM tagged GROUP BY doc_id, tok
        ), perdoc AS (
            SELECT doc_id,
                   sum(c_p)::BIGINT AS n_pred,
                   sum(c_g)::BIGINT AS n_gold,
                   sum(least(c_p, c_g))::BIGINT AS n_overlap
            FROM pertok GROUP BY doc_id
        )
        SELECT doc_id, n_pred, n_gold, n_overlap,
               round(CASE WHEN n_pred > 0
                          THEN n_overlap::DOUBLE / n_pred END, 6) AS p,
               round(CASE WHEN n_gold > 0
                          THEN n_overlap::DOUBLE / n_gold END, 6) AS r,
               round(CASE WHEN n_pred > 0 AND n_gold > 0 THEN
                          CASE WHEN (n_overlap::DOUBLE / n_pred
                                     + n_overlap::DOUBLE / n_gold) > 0
                               THEN 2 * (n_overlap::DOUBLE / n_pred)
                                    * (n_overlap::DOUBLE / n_gold)
                                    / (n_overlap::DOUBLE / n_pred
                                       + n_overlap::DOUBLE / n_gold)
                               ELSE 0.0 END
                     END, 6) AS f1
        FROM perdoc
    """


def _bpe_merges_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Independent pure-Python Sennrich BPE replay (tokenize → weighted
    vocab → iterative pair argmax with (weight desc, pair asc) ties →
    greedy leftmost merge), inlined as a corpus-keyed VALUES table (key =
    document count, which differs across the testdata SFs)."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        syms = {w: list(w) for w in vocab}
        # the SF dirs share the document COUNT — total text length is the
        # distinguishing corpus key
        key = sum(len(t or "") for t in texts)
        for rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            esc_a = a.replace("'", "''")
            esc_b = b.replace("'", "''")
            rows.append(f"({key}, {rank}, '{esc_a}', '{esc_b}', {weight})")
            for w, s in syms.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == a and t == b:
                        out[-1] = a + b
                    else:
                        out.append(t)
                syms[w] = out
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, rank, "left", "right", weight) AS (VALUES
            {vals})
        SELECT rank, "left", "right", weight::BIGINT AS weight
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


_CHI2_CELLS_SQL = """WITH obs AS (SELECT lang AS a, source AS b,
                                count(*)::HUGEINT AS o
                         FROM documents
                         WHERE lang IS NOT NULL AND source IS NOT NULL
                         GROUP BY 1, 2),
            ra AS (SELECT a, sum(o)::HUGEINT AS ra FROM obs GROUP BY 1),
            cb AS (SELECT b, sum(o)::HUGEINT AS cb FROM obs GROUP BY 1),
            nn AS (SELECT sum(o)::HUGEINT AS n FROM obs),
            grid AS (SELECT ra.a, cb.b, coalesce(obs.o, 0)::HUGEINT AS o,
                            ra.ra, cb.cb, nn.n
                     FROM ra CROSS JOIN cb
                     LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
                     CROSS JOIN nn),
            cells AS (SELECT a, b, n,
                             CAST(round(((o * n - ra * cb)::DOUBLE
                                         * (o * n - ra * cb)::DOUBLE
                                         / ((n * ra * cb)::DOUBLE))
                                        * 1000000000, 0) AS BIGINT) AS t
                      FROM grid)"""


def _wordpiece_symbols_oracle() -> str | None:
    """Independent pure-Python WordPiece replay (tokenize → weighted
    word vocab → top-8+alphabet piece set → greedy longest-match with
    ## continuations → symbol rollup), inlined as a corpus-keyed VALUES
    table (key = total text length, the SF discriminator)."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    chars = "abcdefghijklmnopqrstuvwxyz" + "".join(
        chr(c) for c in list(range(0xE0, 0xF7)) + list(range(0xF8, 0x100))
    )
    tok = _re.compile("[a-z\u00e0-\u00f6\u00f8-\u00ff]+")
    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        key = sum(len(t or "") for t in texts)
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        top = [
            w
            for w, _ in sorted(
                vocab.items(), key=lambda kv: (-kv[1], kv[0])
            )[:8]
        ]
        pieces = set(top) | set(chars) | {"##" + ch for ch in chars}

        def enc(w):
            out, i, n = [], 0, len(w)
            while i < n:
                j = n
                found = None
                while j > i:
                    sub = w[i:j] if i == 0 else "##" + w[i:j]
                    if sub in pieces:
                        found = sub
                        break
                    j -= 1
                if found is None:
                    return ["[UNK]"]
                out.append(found)
                i = j
            return out

        agg: dict[str, list[int]] = {}
        for w, n in vocab.items():
            syms = enc(w)
            # occurrences: once per symbol OCCURRENCE (weighted);
            # n_words: once per DISTINCT word containing the symbol —
            # matching countDistinct('word') on the Spark side (a symbol
            # repeated inside one word must not double-count the word)
            for sym in syms:
                agg.setdefault(sym, [0, 0])[1] += n
            for sym in set(syms):
                agg[sym][0] += 1
        for sym, (nw, occ) in sorted(agg.items()):
            esc = sym.replace("'", "''")
            rows.append(f"({key}, '{esc}', {nw}, {occ})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, symbol, n_words, occurrences) AS (VALUES
            {vals})
        SELECT symbol, n_words::BIGINT AS n_words,
               occurrences::BIGINT AS occurrences
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _dsir_weights_oracle(final: str | None = None) -> str:
    """Shared DuckDB replay of the DSIR importance weights (see
    `_q_dsir_weights`): hashed unigram+bigram buckets via the md5-60
    arithmetic, add-one smoothed per-bucket log-ratios in integer
    micro-nats, doc-keyed sums.  ``final`` overrides the closing SELECT
    (receives a ``weights`` CTE with doc_id/n_feats/log_weight_micro) —
    used by the Gumbel-resample oracle."""
    final = final or """
        SELECT doc_id, n_feats, log_weight_micro FROM weights
    """
    return f"""
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents
            ), feats AS (
                SELECT doc_id, lang, unnest(ws) AS f FROM toks
                UNION ALL
                SELECT doc_id, lang,
                       unnest(list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i + 1])) AS f
                FROM toks
            ), bk AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096
                           AS bucket
                FROM feats
            ), rc AS (
                SELECT bucket, count(*)::BIGINT AS c_r FROM bk
                GROUP BY bucket
            ), tc AS (
                SELECT bucket, count(*)::BIGINT AS c_t FROM bk
                WHERE lang = 'en' GROUP BY bucket
            ), tot AS (
                SELECT (SELECT coalesce(sum(c_r), 0) FROM rc) AS n_r,
                       (SELECT coalesce(sum(c_t), 0) FROM tc) AS n_t
            ), ratio AS (
                SELECT g.bucket,
                       round((ln((coalesce(tc.c_t, 0) + 1.0)
                                 / (tot.n_t + 4096.0))
                            - ln((coalesce(rc.c_r, 0) + 1.0)
                                 / (tot.n_r + 4096.0))) * 1e6)::BIGINT
                           AS lr_micro
                FROM (SELECT unnest(generate_series(0, 4095)) AS bucket) g
                LEFT JOIN rc ON rc.bucket = g.bucket
                LEFT JOIN tc ON tc.bucket = g.bucket, tot
            ), scored AS (
                SELECT bk.doc_id, count(*)::BIGINT AS n_feats,
                       sum(r.lr_micro)::BIGINT AS lwm
                FROM bk JOIN ratio r ON r.bucket = bk.bucket
                GROUP BY bk.doc_id
            ), weights AS (
                SELECT d.doc_id,
                       coalesce(s.n_feats, 0)::BIGINT AS n_feats,
                       coalesce(s.lwm, 0)::BIGINT AS log_weight_micro
                FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
            )
            {final}
    """


def _bpe_encode_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Pure-Python replay of learn(8)+encode+symbol-count (the encode half
    of `_bpe_merges_oracle`'s Sennrich replay), inlined as a corpus-keyed
    VALUES table."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        syms = {w: list(w) for w in vocab}
        key = sum(len(t or "") for t in texts)
        for _rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            for w, s in syms.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == a and t == b:
                        out[-1] = a + b
                    else:
                        out.append(t)
                syms[w] = out
        n_words: collections.Counter = collections.Counter()
        occ: collections.Counter = collections.Counter()
        for w, n in vocab.items():
            for sym in set(syms[w]):
                n_words[sym] += 1
            for sym in syms[w]:
                occ[sym] += n
        for sym in sorted(occ):
            esc = sym.replace("'", "''")
            rows.append(f"({key}, '{esc}', {n_words[sym]}, {occ[sym]})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, symbol, n_words, occurrences) AS (VALUES
            {vals})
        SELECT symbol, n_words::BIGINT AS n_words,
               occurrences::BIGINT AS occurrences
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _bpe_fertility_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Pure-Python replay of learn(8) + per-(lang, word) encode +
    fertility aggregation, inlined as a corpus-keyed VALUES table."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["text", "lang"])
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        vocab = collections.Counter()
        by_lang: dict = collections.defaultdict(collections.Counter)
        for txt, lg in zip(texts, langs):
            ws = tok.findall((txt or "").lower())
            vocab.update(ws)
            by_lang[lg].update(ws)
        syms = {w: list(w) for w in vocab}
        key = sum(len(t_ or "") for t_ in texts)
        for _rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            for w, s in syms.items():
                out: list[str] = []
                for c in s:
                    if out and out[-1] == a and c == b:
                        out[-1] = a + b
                    else:
                        out.append(c)
                syms[w] = out
        for lg in sorted(by_lang):
            n_tok = sum(by_lang[lg].values())
            n_sub = sum(n * len(syms[w]) for w, n in by_lang[lg].items())
            fert = round(n_sub / n_tok, 6) if n_tok else None
            rows.append(f"({key}, '{lg}', {n_tok}, {n_sub}, {fert})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, lang, n_tokens, n_subwords, fertility)
             AS (VALUES
            {vals})
        SELECT lang, n_tokens::BIGINT AS n_tokens,
               n_subwords::BIGINT AS n_subwords,
               fertility::DOUBLE AS fertility
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _license_signals_oracle() -> str:
    """Composes the operator's own pattern tuple (imported, not retyped —
    the patterns are RE2-portable by construction) over the residue-footer
    corpus; the class rule mirrors the conservative reservation-wins
    CASE."""
    from pdf_to_epub_spark.operators.textstats import _LICENSE_PATTERNS

    cols = ",\n                       ".join(
        f"regexp_matches(lt, '{pat}') AS {name}"
        for name, pat in _LICENSE_PATTERNS
    )
    return f"""
        WITH docs AS (
            SELECT doc_id,
                   lower(coalesce(text, '') || CASE
                       WHEN doc_id % 6 = 0 THEN
                           ' Licensed under Creative Commons Attribution 4.0.'
                       WHEN doc_id % 6 = 1 THEN
                           ' All Rights Reserved. Copyright 2021 Site.'
                       WHEN doc_id % 6 = 2 THEN
                           ' Released into the Public Domain (CC0).'
                       WHEN doc_id % 6 = 3 THEN
                           ' Shared as CC-BY-SA. (c) 2020 Someone.'
                       ELSE '' END) AS lt
            FROM documents
        ), sig AS (
            SELECT doc_id,
                   {cols}
            FROM docs
        )
        SELECT doc_id, cc_license, public_domain, all_rights,
               copyright_line,
               CASE WHEN all_rights OR copyright_line THEN 'restricted'
                    WHEN cc_license OR public_domain THEN 'open'
                    ELSE 'unknown' END AS license_class
        FROM sig
    """


def _kmeans_profile_oracle(
    n_centroids: int = 16, sample_size: int = 512, seed: int = 5
) -> str | None:
    """DuckDB replica of the Lloyd's-step profile: seed centroids replayed
    in Python over the same hash-spread sample (see _ivf_topk_oracle),
    assignment by list_distance argmin, update/inertia recomputed
    relationally (component explode via the generate_series trick)."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, v, cid, d FROM (
                SELECT e.vec_id, e.v, a.cid, list_distance(e.v, a.c) AS d,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        stats AS (
            SELECT cid, count(*)::BIGINT AS n_points, avg(d) AS mean_dist
            FROM cell GROUP BY cid),
        comp AS (
            SELECT cid, u.j, avg(u.val) AS m
            FROM cell,
                 UNNEST(list_transform(generate_series(1, len(v)),
                                       j -> {{'j': j, 'val': v[j]}})) AS t(u)
            GROUP BY cid, u.j),
        shifts AS (
            SELECT comp.cid,
                   sqrt(sum((comp.m - a.c[comp.j]) * (comp.m - a.c[comp.j])))
                       AS shift
            FROM comp JOIN acts a USING (cid)
            GROUP BY comp.cid)
        SELECT s.cid AS cluster_id, s.n_points,
               round(s.mean_dist, 6) AS mean_dist,
               round(sh.shift, 6) AS shift
        FROM stats s JOIN shifts sh USING (cid)
    """


def _encoding_signals_oracle() -> str:
    """DuckDB replica of encoding_signals over the mutated corpus: the
    marker alternation and the corruption tails are spliced from the SAME
    runtime constants the Spark query uses (never retyped — the bytes
    include NBSP and C1 controls), counters via len(regexp_extract_all)."""
    from pdf_to_epub_spark.operators.textstats import mojibake_pattern

    return f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 6 = 1 THEN text || '{_MOJI_TAIL}'
                        WHEN doc_id % 6 = 4 THEN
                            text || chr(65533) || chr(65533) || chr(7)
                                 || chr(160)
                        ELSE text END AS t
            FROM documents),
        c AS (
            SELECT doc_id, length(t) AS n_chars,
                   len(regexp_extract_all(t, '{mojibake_pattern()}'))
                       AS mojibake_hits,
                   len(regexp_extract_all(t, '\\x{{FFFD}}'))
                       AS replacement_chars,
                   len(regexp_extract_all(t,
                       '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS ctrl_chars,
                   len(regexp_extract_all(t, '\\x{{00A0}}')) AS nbsp_hits
            FROM docs),
        r AS (
            SELECT *,
                   round((mojibake_hits + replacement_chars + ctrl_chars)
                         / greatest(n_chars, 1), 6) AS artifact_rate
            FROM c)
        SELECT doc_id, n_chars, mojibake_hits, replacement_chars, ctrl_chars,
               nbsp_hits, artifact_rate::DOUBLE AS artifact_rate,
               (artifact_rate >= 0.001) AS flagged
        FROM r
    """


def _ocr_artifacts_oracle() -> str:
    """DuckDB replica of ocr_artifact_signals over the mutated corpus
    (same _OCR_TAIL constant spliced; real newlines ride inside the SQL
    literal)."""
    return f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 2 THEN text || '{_OCR_TAIL}'
                        ELSE text END AS t
            FROM documents),
        c AS (
            SELECT doc_id,
                   len(regexp_extract_all(t, '\\n')) AS n_lines_break,
                   len(regexp_extract_all(t, '-\\n[a-z]')) AS hyphen_wraps,
                   len(regexp_extract_all(t, '[A-Za-z][0-9][A-Za-z]'))
                       AS digit_confusions,
                   len(regexp_extract_all(t, '(^|[ \\n])[b-hj-z]([ \\n]|$)'))
                       AS isolated_consonants,
                   len(regexp_extract_all(t, '(^|\\n).{{0,3}}(\\n|$)'))
                       AS short_lines,
                   len(regexp_extract_all(t, '[a-zà-öø-ÿ]+')) AS n_words
            FROM docs),
        r AS (
            SELECT *,
                   round((hyphen_wraps + digit_confusions
                          + isolated_consonants)
                         / greatest(n_words, 1), 6) AS damage_rate
            FROM c)
        SELECT doc_id, hyphen_wraps, digit_confusions, isolated_consonants,
               short_lines, n_words, damage_rate::DOUBLE AS damage_rate,
               (damage_rate >= 0.01) AS needs_repair
        FROM r
    """


def _semantic_dedup_oracle(
    tau: float = 0.4, n_centroids: int = 16, sample_size: int = 512, seed: int = 5
) -> str | None:
    """DuckDB replica of SemDeDup: centroids replayed in Python over the
    same md5-spread sample (per-sf VALUES keyed on vec 0's first
    component, as in _kmeans_profile_oracle), nearest-cell assignment by
    list_distance argmin (ties → cid, matching _nearest_centroids'
    struct sort), within-cell pairs, ROUNDED-cosine threshold, and the
    keep-lowest-id drop rule."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    cos = _COSINE.format(a="a.v", b="b.v")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, a.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM cell a JOIN cell b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round({cos}, 6) >= {tau})
        SELECT c.vec_id, c.cid AS cluster_id,
               (d.vec_id IS NULL) AS kept
        FROM cell c LEFT JOIN dropped d ON c.vec_id = d.vec_id
    """


def _simhash_oracle(max_hamming: int = 3) -> str:
    """DuckDB replica of the full SimHash pipeline over the mutated-recrawl
    corpus: 60-bit md5 token hash (identical to operators/dedup.py
    `md5_hash60`: Spark `conv(substring(md5(tok),1,15),16,10)` ≡ DuckDB
    `('0x' || substr(md5(tok),1,15))::BIGINT`), per-bit majority vote,
    fingerprint reassembly, brute-force all-pairs Hamming filter."""
    votes = ",\n                   ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(60)
    )
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
            FROM corpus
        ),
        hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
            FROM toks
        ),
        votes AS (
            SELECT doc_id,
                   {votes}
            FROM hashed GROUP BY doc_id
        ),
        fp AS (SELECT doc_id, {fingerprint} AS simhash FROM votes)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


