"""Oracle SQL fragments (part 2/4 of the mechanical __spark_entry__ split; entries verbatim)."""
from __future__ import annotations

from entry.queries_01 import _dict_compression_oracle, _lang_spans_oracle
from entry.queries_05 import _NB_SQL_CORE, _media_phash_oracle, _mojibake_oracle
from entry.oracle_helpers import _CHI2_CELLS_SQL, _COSINE


def oracles() -> dict[str, str]:
    return {
        "bfs_distances": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT 'a' || (doc_id % 20) AS src,
                           'a' || ((doc_id % 20 + 1) % 20) AS dst
                    FROM documents
                    UNION ALL
                    SELECT 'a' || (doc_id % 20),
                           'a' || ((3 * (doc_id % 20) + 7) % 20)
                    FROM documents
                    UNION ALL
                    SELECT 'b' || (doc_id % 10),
                           'b' || ((doc_id % 10 + 1) % 10)
                    FROM documents)),
            walk(domain, hops) AS (
                SELECT 'a0', 0
                UNION
                SELECT e.dst, w.hops + 1
                FROM walk w JOIN e ON e.src = w.domain
                WHERE w.hops < 12)
            SELECT domain, min(hops)::INT AS hops FROM walk GROUP BY domain
        """,
        "zorder_layout": """
            WITH base AS (
                SELECT doc_id AS id, n_chars::BIGINT AS x,
                       ((doc_id * 37) % 256)::BIGINT AS y
                FROM documents),
            st AS (
                SELECT min(x) AS minx, max(x) AS maxx,
                       min(y) AS miny, max(y) AS maxy
                FROM base),
            c AS (
                SELECT id, y,
                       ((x - minx) * 256) // (maxx - minx + 1) AS xi,
                       ((y - miny) * 256) // (maxy - miny + 1) AS yi
                FROM base, st),
            z AS (
                SELECT id, y,
                       ((xi>>0)&1)*1 + ((yi>>0)&1)*2 + ((xi>>1)&1)*4
                     + ((yi>>1)&1)*8 + ((xi>>2)&1)*16 + ((yi>>2)&1)*32
                     + ((xi>>3)&1)*64 + ((yi>>3)&1)*128 + ((xi>>4)&1)*256
                     + ((yi>>4)&1)*512 + ((xi>>5)&1)*1024 + ((yi>>5)&1)*2048
                     + ((xi>>6)&1)*4096 + ((yi>>6)&1)*8192
                     + ((xi>>7)&1)*16384 + ((yi>>7)&1)*32768 AS zv
                FROM c),
            b AS (
                SELECT 'natural' AS layout, y,
                       (row_number() OVER (ORDER BY id) - 1) // 50 AS file_id
                FROM z
                UNION ALL
                SELECT 'zorder', y,
                       (row_number() OVER (ORDER BY zv, id) - 1) // 50
                FROM z),
            pf AS (
                SELECT layout, file_id, min(y) AS mn, max(y) AS mx,
                       count(*) AS n,
                       sum(CASE WHEN y BETWEEN 64 AND 127 THEN 1 ELSE 0 END)
                           AS m
                FROM b GROUP BY layout, file_id),
            agg AS (
                SELECT layout, sum(n) AS n_rows, count(*) AS n_files,
                       sum(CASE WHEN mx >= 64 AND mn <= 127 THEN 1 ELSE 0 END)
                           AS files_scanned,
                       sum(CASE WHEN mx >= 64 AND mn <= 127 THEN n ELSE 0 END)
                           AS rows_scanned,
                       sum(m) AS rows_matched
                FROM pf GROUP BY layout)
            SELECT layout, n_rows::BIGINT AS n_rows, n_files::BIGINT AS n_files,
                   files_scanned::BIGINT AS files_scanned,
                   rows_scanned::BIGINT AS rows_scanned,
                   rows_matched::BIGINT AS rows_matched,
                   round(1.0::DOUBLE - files_scanned::DOUBLE / n_files::DOUBLE,
                         6) + 0.0 AS prune_ratio
            FROM agg
        """,
        "kmv_similarity": """
            WITH a AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('u' || (doc_id * 2)), 1, 15))::BIGINT
                           AS h
                FROM documents ORDER BY h LIMIT 64),
            b AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('u' || (doc_id * 3)), 1, 15))::BIGINT
                           AS h
                FROM documents ORDER BY h LIMIT 64),
            u AS (
                SELECT DISTINCT h FROM (
                    SELECT h FROM a UNION ALL SELECT h FROM b)
                ORDER BY h LIMIT 64),
            i AS (
                SELECT count(*) AS ni FROM u
                WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
            nu AS (SELECT count(*) AS nu FROM u),
            sa AS (SELECT count(*) AS na, max(h) AS ha FROM a),
            sb AS (SELECT count(*) AS nb, max(h) AS hb FROM b)
            SELECT 64::INT AS k,
                   na::BIGINT AS n_sketch_old, nb::BIGINT AS n_sketch_new,
                   CASE WHEN na < 64 THEN na::DOUBLE
                        ELSE round(63.0 * 1152921504606846976.0 / ha::DOUBLE, 6)
                   END AS est_distinct_old,
                   CASE WHEN nb < 64 THEN nb::DOUBLE
                        ELSE round(63.0 * 1152921504606846976.0 / hb::DOUBLE, 6)
                   END AS est_distinct_new,
                   CASE WHEN nu > 0
                        THEN round(ni::DOUBLE / nu::DOUBLE, 6)
                        ELSE 0.0 END AS est_jaccard
            FROM sa, sb, nu, i
        """,
        "calibration_bins": """
            WITH d AS (
                SELECT ((doc_id * 37) % 101)::DOUBLE / 100.0 AS s,
                       CASE WHEN ((doc_id * 53 + 11) % 100)
                                 < ((doc_id * 37) % 101)
                            THEN 1 ELSE 0 END AS pos
                FROM documents),
            r AS (
                SELECT least(9, floor(s * 10))::INT AS bin,
                       round(s * 1e6, 0)::BIGINT AS cm, pos
                FROM d),
            per AS (
                SELECT bin, count(*) AS n, sum(cm) AS conf,
                       sum(pos) AS npos
                FROM r GROUP BY bin),
            g AS (
                SELECT bin, n, conf, npos,
                       abs(conf - npos * 1000000) AS ad
                FROM per),
            t AS (
                SELECT round(sum(ad)::DOUBLE / (1e6 * sum(n)::DOUBLE), 6)
                           + 0.0 AS ece
                FROM g)
            SELECT bin, n::BIGINT AS n,
                   round(conf::DOUBLE / (1e6 * n::DOUBLE), 6) + 0.0 AS avg_conf,
                   round(npos::DOUBLE / n::DOUBLE, 6) + 0.0 AS frac_pos,
                   round(ad::DOUBLE / (1e6 * n::DOUBLE), 6) + 0.0 AS gap,
                   ece
            FROM g, t
        """,
        "session_paths": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events),
            p AS (
                SELECT user_id,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM r WHERE rn <= 5 GROUP BY user_id)
            SELECT path, count(*)::BIGINT AS n_users
            FROM p GROUP BY path
            ORDER BY n_users DESC, path LIMIT 20
        """,
        "tracking_params": """
            WITH d AS (
                SELECT doc_id AS i FROM documents WHERE doc_id % 7 <> 0),
            p AS (
                SELECT 'utm_source' AS param, 'feed' AS v, i FROM d
                UNION ALL SELECT 'page', (i % 20)::VARCHAR, i FROM d
                UNION ALL SELECT 'sid', i::VARCHAR, i FROM d
                UNION ALL SELECT 'dbg', NULL, i FROM d WHERE i % 5 = 0),
            a AS (
                SELECT param, count(*) AS n_urls, count(DISTINCT v) AS nd
                FROM p GROUP BY param)
            SELECT param, n_urls::BIGINT AS n_urls,
                   nd::BIGINT AS n_distinct_values,
                   round(nd::DOUBLE / n_urls::DOUBLE, 6) + 0.0
                       AS distinct_ratio,
                   (n_urls >= 5 AND nd::DOUBLE >= 0.5 * n_urls::DOUBLE)
                       AS is_tracking
            FROM a
        """,
        "bootstrap_ci": """
            WITH reps AS (
                SELECT unnest(generate_series(0, 31)) AS rep),
            r AS (
                SELECT rep,
                       ('0x' || substr(md5(doc_id || ':' || rep), 1, 15))
                           ::BIGINT::DOUBLE / 1152921504606846976.0 AS u,
                       n_chars AS v
                FROM documents, reps),
            w AS (
                SELECT rep, v,
                       CASE WHEN u < 0.36787944117144233 THEN 0
                            WHEN u < 0.7357588823428847 THEN 1
                            WHEN u < 0.9196986029286058 THEN 2
                            WHEN u < 0.9810118431238462 THEN 3
                            WHEN u < 0.9963401531726563 THEN 4
                            WHEN u < 0.9994058151824183 THEN 5
                            ELSE 6 END AS w
                FROM r),
            m AS (
                SELECT rep, sum(w * v) AS wv, sum(w) AS sw
                FROM w GROUP BY rep),
            mm AS (
                SELECT wv::DOUBLE / sw::DOUBLE AS m FROM m WHERE sw > 0),
            ci AS (
                SELECT round(quantile_cont(m, 0.025), 6)::DOUBLE AS ci_lo,
                       round(quantile_cont(m, 0.975), 6)::DOUBLE AS ci_hi,
                       count(*)::INT AS n_reps_effective
                FROM mm),
            f AS (
                SELECT count(*) AS n_rows,
                       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6)
                           ::DOUBLE AS mean
                FROM documents)
            SELECT n_rows::BIGINT AS n_rows, n_reps_effective,
                   mean, ci_lo, ci_hi
            FROM f, ci
        """,
        # Paired bootstrap: same weight ladder over the per-doc DELTA
        # round((n_chars/5)*1e6) - round(n_words*1e6); win_rate = share
        # of replicate means > 0.
        "paired_bootstrap": """
            WITH base AS (
                SELECT doc_id,
                       CAST(round((n_chars::DOUBLE / 5) * 1e6) AS BIGINT)
                       - CAST(round(len(regexp_extract_all(
                             lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE * 1e6)
                           AS BIGINT) AS d
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL),
            reps AS (SELECT unnest(generate_series(0, 31)) AS rep),
            r AS (
                SELECT rep,
                       ('0x' || substr(md5(doc_id || ':' || rep), 1, 15))
                           ::BIGINT::DOUBLE / 1152921504606846976.0 AS u,
                       d
                FROM base, reps),
            w AS (
                SELECT rep, d,
                       CASE WHEN u < 0.36787944117144233 THEN 0
                            WHEN u < 0.7357588823428847 THEN 1
                            WHEN u < 0.9196986029286058 THEN 2
                            WHEN u < 0.9810118431238462 THEN 3
                            WHEN u < 0.9963401531726563 THEN 4
                            WHEN u < 0.9994058151824183 THEN 5
                            ELSE 6 END AS w
                FROM r),
            m AS (
                SELECT rep, sum(w * d) AS wd, sum(w) AS sw
                FROM w GROUP BY rep),
            mm AS (
                SELECT wd::DOUBLE / (1e6 * sw::DOUBLE) AS m
                FROM m WHERE sw > 0),
            ci AS (
                SELECT round(quantile_cont(m, 0.025), 6)::DOUBLE AS ci_lo,
                       round(quantile_cont(m, 0.975), 6)::DOUBLE AS ci_hi,
                       round(avg(CASE WHEN m > 0 THEN 1.0 ELSE 0.0 END),
                             6)::DOUBLE AS win_rate,
                       count(*)::INT AS n_reps_effective
                FROM mm),
            f AS (
                SELECT count(*) AS n_rows,
                       round(sum(d)::DOUBLE / (1e6 * count(*)::DOUBLE), 6)
                           ::DOUBLE AS mean_delta
                FROM base)
            SELECT n_rows::BIGINT AS n_rows, n_reps_effective, mean_delta,
                   ci_lo, ci_hi, win_rate
            FROM f, ci
        """,
        "term_burstiness": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+')) AS term
                FROM documents),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term),
            per AS (
                SELECT term, count(*) AS doc_freq, sum(tf) AS total_tf,
                       sum(tf * tf) AS tf2
                FROM tf GROUP BY term),
            n AS (SELECT count(*) AS nn FROM documents)
            SELECT term, doc_freq::BIGINT AS doc_freq,
                   total_tf::BIGINT AS total_tf,
                   round(total_tf::DOUBLE / doc_freq::DOUBLE, 6) + 0.0
                       AS burstiness,
                   round((tf2::DOUBLE / nn::DOUBLE
                          - (total_tf::DOUBLE / nn::DOUBLE)
                            * (total_tf::DOUBLE / nn::DOUBLE))
                         / (total_tf::DOUBLE / nn::DOUBLE), 6) + 0.0 AS vmr
            FROM per, n
            ORDER BY total_tf DESC, term LIMIT 30
        """,
        "pdf_outline": """
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL OR text = '' THEN 0
                            ELSE len(string_split(text, ' ')) END AS nw
                FROM documents),
            pg AS (
                SELECT doc_id,
                       ((1 + (nw + 7) // 8) + 5) // 6 AS np
                FROM d),
            parts AS (
                SELECT doc_id, unnest(generate_series(1, np - 1)) AS p
                FROM pg),
            rows_ AS (
                SELECT doc_id, 0 AS seq, 0 AS level,
                       'Document ' || doc_id AS title, 0 AS page
                FROM pg
                UNION ALL
                SELECT doc_id, p + (p - 1) // 2, 1, 'Part ' || p, p
                FROM parts
                UNION ALL
                SELECT doc_id, p + (p - 1) // 2 + 1, 2, 'Detail ' || p, p
                FROM parts WHERE p % 2 = 0)
            SELECT doc_id, seq::INT AS seq, level::INT AS level, title,
                   page::INT AS page
            FROM rows_
        """,
        "embedding_quantize": """
            WITH s AS (
                SELECT vec_id, embedding,
                       len(embedding) AS n_dims,
                       list_max(list_transform(
                           embedding, x -> abs(x::DOUBLE))) AS sc
                FROM embeddings),
            q AS (
                SELECT vec_id, embedding, n_dims, sc,
                       CASE WHEN sc > 0 THEN list_transform(
                           embedding,
                           x -> least(127.0, greatest(-127.0,
                               round(x::DOUBLE / sc * 127.0, 0)))::INT)
                       END AS qs
                FROM s),
            e AS (
                SELECT vec_id, n_dims, sc, qs,
                       CASE WHEN sc > 0 THEN list_transform(
                           embedding,
                           (x, i) -> round((x::DOUBLE
                               - qs[i]::DOUBLE * sc / 127.0) * 1e9,
                               0)::BIGINT)
                       END AS err,
                       CASE WHEN sc > 0 THEN list_sum(list_transform(
                           embedding,
                           x -> round(abs(x::DOUBLE) * 1e9, 0)::BIGINT))
                       END AS sav
                FROM q),
            g AS (
                SELECT vec_id, n_dims,
                       CASE WHEN sc > 0
                            THEN round(sc * 1e9, 0)::BIGINT END AS scale_nano,
                       CASE WHEN sc > 0 THEN list_max(
                           list_transform(qs, q -> abs(q))) END AS max_q,
                       CASE WHEN sc > 0 THEN list_sum(
                           list_transform(err, x -> abs(x)))
                       END AS mae_nano,
                       sav
                FROM e)
            SELECT vec_id, n_dims::INT AS n_dims, scale_nano,
                   max_q::INT AS max_q, mae_nano::BIGINT AS mae_nano,
                   CASE WHEN sav > 0 THEN
                       round(mae_nano::DOUBLE / sav::DOUBLE, 6) + 0.0
                   END AS rel_err
            FROM g
        """,
        "pdf_chapters": """
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents),
            words AS (
                SELECT doc_id,
                       CASE WHEN text = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(text, ' ') END AS ws
                FROM d),
            lines AS (
                SELECT doc_id, 0::BIGINT AS block_id,
                       'Document ' || doc_id AS text
                FROM words
                UNION ALL
                SELECT doc_id, i AS block_id,
                       array_to_string(
                           list_slice(ws, (i - 1) * 8 + 1, i * 8), ' ')
                           AS text
                FROM (
                    SELECT doc_id, ws,
                           unnest(generate_series(
                               1, CAST(ceil(len(ws) / 8.0) AS BIGINT)
                           )) AS i
                    FROM words)),
            blk AS (
                SELECT doc_id, block_id // 6 AS page,
                       length(text) AS chars
                FROM lines),
            np AS (
                SELECT doc_id, max(page) + 1 AS np
                FROM blk GROUP BY doc_id),
            ch AS (
                SELECT doc_id, 0 AS chapter_seq,
                       'Document ' || doc_id AS title, 0 AS first_page
                FROM np
                UNION ALL
                SELECT doc_id, (p + 1) // 2, 'Part ' || p, p
                FROM (
                    SELECT doc_id,
                           unnest(generate_series(1, np - 1, 2)) AS p
                    FROM np)),
            chr AS (
                SELECT c.doc_id, chapter_seq, title, first_page,
                       coalesce(
                           lead(first_page) OVER (
                               PARTITION BY c.doc_id
                               ORDER BY chapter_seq) - 1,
                           n.np - 1) AS last_page
                FROM ch c JOIN np n ON c.doc_id = n.doc_id),
            agg AS (
                SELECT c.doc_id, chapter_seq, title, first_page, last_page,
                       count(*) AS n_blocks, sum(chars) AS n_chars
                FROM chr c JOIN blk b
                  ON b.doc_id = c.doc_id
                 AND b.page BETWEEN c.first_page AND c.last_page
                GROUP BY c.doc_id, chapter_seq, title, first_page,
                         last_page)
            SELECT doc_id, chapter_seq::INT AS chapter_seq, title,
                   first_page::INT AS first_page,
                   last_page::INT AS last_page,
                   n_blocks::BIGINT AS n_blocks, n_chars::BIGINT AS n_chars
            FROM agg
        """,
        "graph_modularity": """
            WITH raw AS (
                SELECT 'n' || (doc_id % 20) AS s,
                       'n' || (((doc_id % 20) % 10 + 1) % 10
                               + ((doc_id % 20) - (doc_id % 20) % 10)) AS t
                FROM documents
                UNION ALL
                SELECT 'n' || (doc_id % 20),
                       'n' || ((doc_id % 20 + 10) % 20)
                FROM documents WHERE doc_id % 4 = 0),
            und AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw WHERE s <> t),
            deg AS (
                SELECT n, count(*) AS deg FROM (
                    SELECT a AS n FROM und
                    UNION ALL SELECT b FROM und) GROUP BY n),
            comm AS (
                SELECT 'n' || m AS domain,
                       CASE WHEN m >= 10 THEN 1 ELSE 0 END AS c
                FROM (SELECT DISTINCT doc_id % 20 AS m FROM documents)),
            pn AS (
                SELECT c, count(*) AS n_nodes,
                       sum(coalesce(deg, 0)) AS total_degree
                FROM comm LEFT JOIN deg ON comm.domain = deg.n
                GROUP BY c),
            intr AS (
                SELECT ca.c AS c, count(*) AS internal_edges
                FROM und
                JOIN comm ca ON und.a = ca.domain
                JOIN comm cb ON und.b = cb.domain
                WHERE ca.c = cb.c GROUP BY ca.c),
            m AS (SELECT count(*) AS mm FROM und),
            g AS (
                SELECT c, n_nodes,
                       coalesce(internal_edges, 0) AS ie, total_degree
                FROM pn LEFT JOIN intr USING (c)),
            qq AS (
                SELECT c, n_nodes, ie, total_degree,
                       CASE WHEN mm > 0 THEN
                           round((ie::DOUBLE / mm::DOUBLE
                                  - (total_degree::DOUBLE
                                     / (2.0 * mm::DOUBLE))
                                    * (total_degree::DOUBLE
                                       / (2.0 * mm::DOUBLE))) * 1e6,
                                 0)::BIGINT
                       ELSE 0 END AS qm
                FROM g, m),
            tot AS (
                SELECT round(sum(qm)::DOUBLE / 1e6, 6) + 0.0 AS modularity
                FROM qq)
            SELECT c AS community, n_nodes::BIGINT AS n_nodes,
                   ie::BIGINT AS internal_edges,
                   total_degree::BIGINT AS total_degree,
                   round(qm::DOUBLE / 1e6, 6) + 0.0 AS q_contrib,
                   modularity
            FROM qq, tot
        """,
        "proportion_test": """
            WITH d AS (
                SELECT (doc_id % 2)::VARCHAR AS g,
                       CASE WHEN ((doc_id * 13) % 100)
                                 < (55 + 13 * (doc_id % 2))
                            THEN 1 ELSE 0 END AS s
                FROM documents),
            c AS (
                SELECT
                    sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_a,
                    sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_b,
                    sum(CASE WHEN g = '0' THEN s ELSE 0 END) AS pos_a,
                    sum(CASE WHEN g = '1' THEN s ELSE 0 END) AS pos_b
                FROM d),
            z AS (
                SELECT n_a, n_b,
                       pos_a::DOUBLE / n_a::DOUBLE AS ra,
                       pos_b::DOUBLE / n_b::DOUBLE AS rb,
                       (pos_a + pos_b)::DOUBLE / (n_a + n_b)::DOUBLE AS pp
                FROM c),
            v AS (
                SELECT n_a, n_b, ra, rb,
                       pp * (1.0 - pp)
                           * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)
                           AS var
                FROM z)
            SELECT '0' AS group_a, '1' AS group_b,
                   n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   round(ra, 6) + 0.0 AS rate_a,
                   round(rb, 6) + 0.0 AS rate_b,
                   CASE WHEN var > 0
                        THEN round((ra - rb) / sqrt(var), 6) + 0.0
                   END AS z,
                   CASE WHEN var > 0 THEN
                       abs((ra - rb) / sqrt(var))
                           > 1.959963984540054::DOUBLE
                   ELSE FALSE END AS significant
            FROM v
        """,
        "snapshot_expiry": """
            WITH man AS (
                SELECT DISTINCT snap, path FROM (
                    SELECT doc_id % 5 AS snap,
                           'f' || (doc_id % 40) AS path
                    FROM documents
                    UNION ALL
                    SELECT (doc_id * 3) % 5, 'f' || (doc_id % 40)
                    FROM documents)),
            cut AS (
                SELECT min(s) AS cut FROM (
                    SELECT DISTINCT snap AS s FROM man
                    ORDER BY s DESC LIMIT 2)),
            per AS (
                SELECT path, max(snap) AS last_snapshot,
                       count(*) AS n_refs,
                       max(CASE WHEN snap >= cut THEN 1 ELSE 0 END) AS kept
                FROM man, cut GROUP BY path)
            SELECT path, last_snapshot::BIGINT AS last_snapshot,
                   n_refs::BIGINT AS n_refs,
                   kept = 1 AS referenced_by_kept,
                   CASE WHEN kept = 1 THEN 'keep' ELSE 'delete' END
                       AS action
            FROM per
        """,
        "extract_lists": """
            WITH d AS (SELECT doc_id AS i FROM documents),
            rows_ AS (
                SELECT i, 0 AS list_id, FALSE AS ordered, 0 AS item_id,
                       2 AS n_items, 'alpha' AS item_text
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 0, FALSE, 1, 2, 'beta'
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 1, TRUE, 0, 1, 'one'
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 0, TRUE, 0, 3, 'x'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, TRUE, 1, 3, 'y'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, TRUE, 2, 3, 'z'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, FALSE, 0, 1, 'unclosed item closed'
                FROM d WHERE i % 4 = 3)
            SELECT i AS doc_id, list_id::INT AS list_id, ordered,
                   item_id::INT AS item_id, n_items::INT AS n_items,
                   item_text
            FROM rows_
        """,
        "change_rate": """
            WITH obs AS (
                SELECT DISTINCT
                       'u' || (doc_id % 50) AS url,
                       doc_id % 6 AS snap,
                       md5('c' || (doc_id % 50) || ':'
                           || ((doc_id % 6) // 2)) AS h
                FROM documents),
            lagged AS (
                SELECT url, h,
                       lag(h) OVER (PARTITION BY url ORDER BY snap) AS ph
                FROM obs),
            per AS (
                SELECT url, count(*) AS n_obs,
                       sum(CASE WHEN ph IS NOT NULL AND ph <> h
                                THEN 1 ELSE 0 END) AS n_changes
                FROM lagged GROUP BY url)
            SELECT url, n_obs::BIGINT AS n_obs,
                   n_changes::BIGINT AS n_changes,
                   CASE WHEN n_obs > 1 THEN
                       round(n_changes::DOUBLE / (n_obs - 1)::DOUBLE, 6)
                           + 0.0
                   END AS change_rate
            FROM per
        """,
        "skipgram_pairs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
                FROM toks),
            pr AS (
                SELECT doc_id, ws, i,
                       unnest(generate_series(
                           i + 1, least(i + 3, len(ws)))) AS j
                FROM pos),
            pairs AS (
                SELECT least(ws[i], ws[j]) AS term_a,
                       greatest(ws[i], ws[j]) AS term_b
                FROM pr),
            cnt AS (
                SELECT term_a, term_b, count(*) AS n_cooc
                FROM pairs GROUP BY term_a, term_b)
            SELECT term_a, term_b, n_cooc::BIGINT AS n_cooc
            FROM cnt WHERE n_cooc >= 2
            ORDER BY n_cooc DESC, term_a, term_b LIMIT 40
        """,
        "zipf_fit": """
            WITH cnt AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS t
                FROM documents),
            top AS (
                SELECT t, count(*)::BIGINT AS c FROM cnt
                GROUP BY t ORDER BY c DESC, t ASC LIMIT 64),
            pts AS (
                SELECT round(ln(row_number() OVER (ORDER BY c DESC, t ASC))
                             * 1e9)::HUGEINT AS x,
                       round(ln(c) * 1e9)::HUGEINT AS y
                FROM top),
            s AS (
                SELECT count(*)::BIGINT AS k, sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM pts)
            SELECT k::INTEGER AS n_terms,
                   CASE WHEN k::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE <> 0 THEN
                   round((k::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                         6) END AS slope,
                   CASE WHEN k::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE <> 0 THEN
                   round(((sy::DOUBLE
                           - ((k::DOUBLE * sxy::DOUBLE
                               - sx::DOUBLE * sy::DOUBLE)
                              / (k::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                          / k::DOUBLE) / 1e9, 6) END AS intercept
            FROM s
        """,
        "dict_compression": _dict_compression_oracle(),
        # NB replay core + the same integer Mann-Whitney eval aggregation
        "classifier_eval": _NB_SQL_CORE + """,
            ev AS (
                SELECT (cf - ct)::BIGINT AS margin,
                       doc_id % 2 = 0 AS truth
                FROM pivoted WHERE doc_id % 3 = 1
            ),
            per AS (
                SELECT margin,
                       sum(CASE WHEN truth THEN 1 ELSE 0 END)::BIGINT AS np,
                       sum(CASE WHEN truth THEN 0 ELSE 1 END)::BIGINT AS nn
                FROM ev GROUP BY margin
            ),
            cum AS (
                SELECT *, coalesce(sum(nn) OVER (
                    ORDER BY margin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cb
                FROM per
            ),
            agg AS (
                SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
                       sum(CASE WHEN margin > 0 THEN np ELSE 0 END)::BIGINT
                           AS tp,
                       sum(CASE WHEN margin > 0 THEN nn ELSE 0 END)::BIGINT
                           AS fp,
                       sum(CASE WHEN margin <= 0 THEN nn ELSE 0 END)::BIGINT
                           AS tn,
                       sum(CASE WHEN margin <= 0 THEN np ELSE 0 END)::BIGINT
                           AS fn,
                       sum(np * (2 * cb + nn))::BIGINT AS u2
                FROM cum
            )
            SELECT n_pos, n_neg, tp, fp, tn, fn,
                   CASE WHEN tp + fp > 0
                        THEN round(tp / (tp + fp), 6) END AS precision,
                   CASE WHEN n_pos > 0
                        THEN round(tp / n_pos, 6) END AS recall,
                   CASE WHEN tp + fp > 0 AND n_pos > 0
                        THEN round(2 * tp / (2 * tp + fp + fn), 6) END AS f1,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN round(u2::DOUBLE / (2 * n_pos * n_neg), 6)
                   END AS auc
            FROM agg
        """,
        # independent algorithm: positional rows (parallel unnest) +
        # within-doc self-join; position BASE (0- vs 1-) cancels in the
        # difference.
        "proximity_search": """
            WITH tok AS (
                SELECT doc_id, unnest(tk) AS tk,
                       unnest(generate_series(1, len(tk))) AS pos
                FROM (
                    SELECT doc_id,
                           regexp_extract_all(lower(text),
                                              '[a-zà-öø-ÿ]+') AS tk
                    FROM documents)
            )
            SELECT a.doc_id, min(abs(a.pos - b.pos))::INTEGER AS min_dist
            FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tk = 'spark' AND b.tk = 'window'
            GROUP BY a.doc_id
            HAVING min(abs(a.pos - b.pos)) <= 12
        """,
        "lang_spans": _lang_spans_oracle(),
        # Covariance from integer-nano moment sums: per-product
        # round-half-away nanos summed as BIGINT (order-independent),
        # final formula shape mirrored exactly.
        "embedding_covariance": """
            WITH x AS (
                SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings
            ),
            n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
            sv AS (
                SELECT i, sum(round(v * 1e9)::BIGINT) AS svn
                FROM x GROUP BY i
            ),
            sp AS (
                SELECT a.i AS i, b.i AS j,
                       sum(round(a.v * b.v * 1e9)::BIGINT) AS spn
                FROM x a JOIN x b USING (vec_id)
                GROUP BY 1, 2
            )
            SELECT sp.i::INTEGER AS i, sp.j::INTEGER AS j,
                   -- + 0 normalizes negative zero (engines disagree)
                   round((sp.spn / 1e9) / n.n
                         - (sa.svn / 1e9 / n.n) * (sb.svn / 1e9 / n.n),
                         6) + 0 AS cov
            FROM sp
            CROSS JOIN n
            JOIN sv sa ON sa.i = sp.i
            JOIN sv sb ON sb.i = sp.j
        """,
        # NB train+score replayed relationally: token buckets via the
        # 60-bit md5-prefix idiom, Laplace costs in integer micro-nats
        # (floor(x*1e6+0.5) == the driver-side Python rounding; ln is the
        # same glibc on this box), priors from class doc counts.
        "nb_classifier": _NB_SQL_CORE + """
            SELECT doc_id, n_tokens::INTEGER AS n_tokens,
                   cf::BIGINT AS cost_false_micro,
                   ct::BIGINT AS cost_true_micro,
                   ct < cf AS pred_label,
                   (cf - ct)::BIGINT AS margin_micro
            FROM pivoted
        """,
        "corpus_rollup": """
            SELECT lang, source,
                   GROUPING(lang, source)::INT AS gid,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   ROUND(avg(n_chars), 6)::DOUBLE AS avg_chars
            FROM documents
            GROUP BY ROLLUP(lang, source)
        """,
        "sentence_stats": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 40) || '. '
                       || substr(text, 41, 60) || '! '
                       || substr(text, 101, 50)
                       || CASE WHEN doc_id % 3 = 0 THEN '? Short tail.'
                               ELSE '...' END AS text
                FROM documents),
            t AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               x -> trim(x)),
                           x -> x != '') AS sents
                FROM s),
            m AS (
                SELECT doc_id, sents, len(sents) AS n,
                       list_transform(sents, x -> length(x)) AS lens
                FROM t)
            SELECT doc_id,
                   n::INT AS n_sentences,
                   CASE WHEN n > 0
                        THEN ROUND(list_sum(lens) / n::DOUBLE, 6)
                        END::DOUBLE AS avg_sentence_chars,
                   CASE WHEN n > 0 THEN list_max(lens) END::INT
                       AS max_sentence_chars,
                   CASE WHEN n > 0
                        THEN ROUND(len(list_filter(sents,
                                                   x -> length(x) < 20))
                                   / n::DOUBLE, 6)
                        END::DOUBLE AS short_sentence_ratio
            FROM m
        """,
        "dedup_paragraphs": """
            WITH src AS (
                SELECT doc_id,
                       'Shared boilerplate header unit'
                       || chr(10) || chr(10)
                       || substr(text, 1, 80) || ' tail ' || doc_id
                       || chr(10) || chr(10)
                       || 'Footer block ' || (doc_id % 7) AS text
                FROM documents),
            paras AS (
                SELECT doc_id, u.pos, u.para FROM (
                    SELECT doc_id,
                           string_split(text, chr(10) || chr(10)) AS lst
                    FROM src),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'para': lst[j]}))
                    AS t(u)
                -- same unit-is-content class as the Spark side
                -- (space/tab/CR/NL), not space-only trim
                WHERE regexp_matches(u.para, '[^ \\t\\r\\n]')),
            keep AS (
                SELECT doc_id, pos, para FROM (
                    SELECT doc_id, pos, para,
                           row_number() OVER (PARTITION BY para
                                              ORDER BY doc_id, pos) AS rn
                    FROM paras)
                WHERE rn = 1),
            tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_paras
                FROM paras GROUP BY doc_id),
            agg AS (
                SELECT doc_id,
                       string_agg(para, chr(10) || chr(10) ORDER BY pos)
                           AS text,
                       count(*)::BIGINT AS n_kept
                FROM keep GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(a.text, '') AS text,
                   t.n_paras,
                   coalesce(a.n_kept, 0)::BIGINT AS n_kept
            FROM tot t LEFT JOIN agg a USING (doc_id)
        """,
        "html_outline": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><h1 class="t">Doc ' || doc_id || '</h1>'
                       || CASE WHEN doc_id % 3 = 0
                               THEN '<h2> Intro <em>' || doc_id
                                    || '</em></h2><p>xx</p><h2>Methods</h2>'
                               WHEN doc_id % 3 = 1 THEN '<H2>Only</H2>'
                               ELSE '' END
                       || CASE WHEN doc_id % 4 = 0
                               THEN '<h3>Deep ' || (doc_id % 5) || '</h3 >'
                               ELSE '' END
                       || '</body></html>' AS html
                FROM documents),
            hm AS (
                SELECT doc_id, u.pos, u.m FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<h[1-6][^>]*>.*?</h[1-6]\\s*>') AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'm': lst[j]}))
                    AS t(u))
            SELECT doc_id, pos::INT AS pos,
                   regexp_extract(m, '(?i)<h([1-6])', 1)::INT AS level,
                   trim(regexp_replace(regexp_replace(m,
                        '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))
                       AS heading
            FROM hm
        """,
        "html_tables": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><table id="t">'
                       || '<tr><th>Name</th><th> Value </th></tr>'
                       || '<tr><td>a' || doc_id
                       || '</td><td><b>bold</b> ' || (doc_id % 9)
                       || '</td></tr>'
                       || CASE WHEN doc_id % 3 >= 1
                               THEN '<tr ><td>x</td><td>y</td></tr>'
                               ELSE '' END
                       || CASE WHEN doc_id % 3 = 2
                               THEN '<tr><td colspan=2>wide '
                                    || (doc_id % 4) || '</td></tr>'
                               ELSE '' END
                       || '</table>'
                       || CASE WHEN doc_id % 4 = 0
                               THEN '<table><tr><td>z</td></tr></table >'
                               ELSE '' END
                       || '</body></html>' AS html
                FROM documents),
            tb AS (
                SELECT doc_id, u.table_id, u.t FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<table[^>]*>.*?</table\\s*>') AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'table_id': j - 1,
                                            't': lst[j]})) AS x(u)),
            rw AS (
                SELECT doc_id, table_id, u.row_id, u.r FROM (
                    SELECT doc_id, table_id,
                           regexp_extract_all(t,
                               '(?is)<tr[^>]*>(.*?)</tr\\s*>', 1) AS lst
                    FROM tb),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'row_id': j - 1,
                                            'r': lst[j]})) AS x(u)),
            cl AS (
                SELECT doc_id, table_id, row_id,
                       list_transform(
                           regexp_extract_all(r,
                               '(?is)<t[dh][^>]*>(.*?)</t[dh]\\s*>', 1),
                           x -> trim(regexp_replace(regexp_replace(x,
                                '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')))
                           AS cells
                FROM rw)
            SELECT doc_id, table_id::INT AS table_id, row_id::INT AS row_id,
                   len(cells)::INT AS n_cells,
                   array_to_string(cells, '|') AS cells
            FROM cl
        """,
        # robots.txt star-group parsing replayed arithmetically from the
        # residue rules the fixture encodes (r%3==2 domains have no star
        # group and are absent)
        "robots_rules": """
            WITH rs AS (SELECT DISTINCT doc_id % 13 AS r FROM documents)
            SELECT 'site' || r || '.example' AS domain,
                   CASE WHEN r % 3 = 0
                        THEN '/private' || r || '/|/tmp' || r || '*x'
                        ELSE '/only' || r || '/' END AS rules,
                   CASE WHEN r % 3 = 1 THEN 2.0 END::DOUBLE AS crawl_delay
            FROM rs WHERE r % 3 IN (0, 1)
        """,
        # the politeness gate: blocked iff the path case hits the domain's
        # star-group Disallow set (incl. the conservative /tmp{r} wildcard
        # prefix)
        "robots_gate": """
            WITH p AS (
                SELECT doc_id, doc_id % 13 AS r, doc_id % 4 AS m,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' ||
                       CASE doc_id % 4
                           WHEN 0 THEN '/private' || (doc_id % 13) || '/p'
                                       || doc_id || '.html'
                           WHEN 1 THEN '/ok/p' || doc_id || '.html'
                           WHEN 2 THEN '/only' || (doc_id % 13) || '/x'
                           ELSE '/tmp' || (doc_id % 13) || 'zz'
                       END AS url
                FROM documents)
            SELECT doc_id, url FROM p
            WHERE NOT ((r % 3 = 0 AND m IN (0, 3)) OR (r % 3 = 1 AND m = 2))
        """,
        # anchor extraction replayed arithmetically (two surviving anchors
        # per page: the tag-stripped external one, the resolved local one)
        "anchor_texts": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example/a/page' || doc_id
                       || '.html' AS url
                FROM documents)
            SELECT url, target, anchor FROM (
                SELECT url,
                       'https://t' || (i % 3) || '.example/x' || (i % 5)
                           AS target,
                       'Guide ' || (i % 4) AS anchor
                FROM src
                UNION ALL
                SELECT url, origin || '/p' || i, 'Local ' || (i % 2)
                FROM src)
        """,
        # the per-domain top-2 replay: same counts, same (count desc,
        # lexical) tie-break
        "top_anchors": """
            WITH a AS (
                SELECT 't' || (doc_id % 3) || '.example' AS domain,
                       'Guide ' || (doc_id % 4) AS anchor
                FROM documents
                UNION ALL
                SELECT 'site' || (doc_id % 13) || '.example',
                       'Local ' || (doc_id % 2)
                FROM documents),
            c AS (SELECT domain, anchor, COUNT(*) AS n_refs
                  FROM a GROUP BY domain, anchor)
            SELECT domain, anchor, n_refs, rank FROM (
                SELECT domain, anchor, n_refs,
                       ROW_NUMBER() OVER (PARTITION BY domain
                           ORDER BY n_refs DESC, anchor) AS rank
                FROM c)
            WHERE rank <= 2
        """,
        # publisher-declared dedup replayed: cluster by declared canonical
        # (or self), keep the canonical member else the lexical min
        "canonical_dedup": """
            WITH p AS (
                SELECT doc_id, 'https://d.example/p' || doc_id AS url,
                       CASE WHEN doc_id % 3 = 1
                            THEN 'https://d.example/p' || (doc_id - 1)
                            WHEN doc_id % 3 = 2
                            THEN 'https://x.example/shared' END AS canon
                FROM documents),
            c AS (SELECT doc_id, url, COALESCE(canon, url) AS cluster FROM p)
            SELECT doc_id, url FROM (
                SELECT doc_id, url,
                       ROW_NUMBER() OVER (PARTITION BY cluster
                           ORDER BY (url = cluster) DESC, url) AS rn
                FROM c)
            WHERE rn = 1
        """,
        "page_meta": """
            SELECT doc_id,
                   'Doc ' || doc_id AS title,
                   (doc_id % 6) IN (0, 2, 4, 5) AS noindex,
                   (doc_id % 6) IN (0, 1, 4, 5) AS nofollow,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'https://c.example/p' || doc_id
                        ELSE NULL END AS canonical
            FROM documents
        """,
        # outlink resolution replayed arithmetically: the synthetic pages
        # are pure functions of doc_id, so the expected (url, target) set
        # is constructed directly — any regex/when-chain bug on the Spark
        # side (missed quote form, wrong base join, undropped mailto)
        # breaks the hash
        "page_outlinks": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example/dir' || (doc_id % 3)
                       || '/page' || doc_id || '.html' AS url
                FROM documents)
            SELECT url, target FROM (
                SELECT url,
                       'https://ext' || (i % 5) || '.example.org/x' || i
                           AS target
                FROM src
                UNION ALL
                SELECT url, 'https://cdn' || (i % 2) || '.example.net/y'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/root' || (i % 4) || '.html'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/dir' || (i % 3) || '/rel' || (i % 6)
                       || '.html'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/dir' || (i % 3) || '/uq' || (i % 6)
                       || '.html'
                FROM src)
        """,
        # fused gate: the gopher feats and repetition replicas joined, with
        # keep_all computed from the ROUNDED ratios exactly as the Spark
        # out_cols do — verifies the zero-shuffle arrow engine end-to-end
        "quality_gate": r"""
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
                FROM w),
            verdicts AS (
                SELECT doc_id,
                       (n_words BETWEEN 20 AND 100000
                        AND mean_wlen BETWEEN 3.0 AND 10.0
                        AND symbol_ratio < 0.1
                        AND bullet_ratio < 0.9
                        AND ellipsis_ratio < 0.3
                        AND alpha_ratio > 0.8
                        AND stop_hits >= 2) AS keep
                FROM feats),
            base AS (
                SELECT doc_id, length(text) AS n_chars,
                       len(lines) AS n_lines,
                       len(list_distinct(lines)) AS n_dlines,
                       coalesce(list_aggregate(list_transform(lines,
                           l -> length(l)), 'sum'), 0) AS chars,
                       coalesce(list_aggregate(list_transform(
                           list_distinct(lines), l -> length(l)), 'sum'), 0)
                           AS dchars
                FROM w),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(words) - 1),
                           i -> words[i] || ' ' || words[i + 1])) AS gram
                FROM w WHERE len(words) >= 2),
            counts AS (
                SELECT doc_id, gram, count(*) AS cnt
                FROM grams GROUP BY doc_id, gram),
            top AS (
                SELECT doc_id, cnt * length(gram) AS covered
                FROM (SELECT doc_id, gram, cnt,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram ASC) AS rn
                      FROM counts)
                WHERE rn = 1),
            reps AS (
                SELECT b.doc_id,
                       CASE WHEN n_lines > 0 THEN
                            round((n_lines - n_dlines)::DOUBLE / n_lines, 4)
                       ELSE 0.0 END AS dup_line_ratio,
                       CASE WHEN chars > 0 THEN
                            round((chars - dchars)::DOUBLE / chars, 4)
                       ELSE 0.0 END AS dup_line_char_ratio,
                       round(coalesce(t.covered::DOUBLE
                                      / greatest(b.n_chars, 1), 0.0), 4)
                           AS top_bigram_char_ratio
                FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id)
            SELECT v.doc_id, v.keep,
                   r.dup_line_ratio, r.dup_line_char_ratio,
                   r.top_bigram_char_ratio,
                   (v.keep AND r.dup_line_char_ratio < 0.2
                    AND r.top_bigram_char_ratio < 0.2) AS keep_all
            FROM verdicts v JOIN reps r ON r.doc_id = v.doc_id
        """,
        # Same line/bigram constructions in DuckDB; top bigram by
        # (count desc, gram asc) — overlapping occurrences counted, so the
        # coverage ratio can exceed 1 by construction (both engines agree).
        "repetition_signals": r"""
            WITH lined AS (
                SELECT doc_id, text,
                       list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(l, '[^ \t\r]')) AS lines
                FROM documents),
            base AS (
                SELECT doc_id, text, length(text) AS n_chars,
                       len(lines) AS n_lines,
                       len(list_distinct(lines)) AS n_dlines,
                       coalesce(list_aggregate(list_transform(lines,
                           l -> length(l)), 'sum'), 0) AS chars,
                       coalesce(list_aggregate(list_transform(
                           list_distinct(lines), l -> length(l)), 'sum'), 0)
                           AS dchars
                FROM lined),
            words AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i + 1])) AS gram
                FROM words WHERE len(w) >= 2),
            counts AS (
                SELECT doc_id, gram, count(*) AS cnt
                FROM grams GROUP BY doc_id, gram),
            top AS (
                SELECT doc_id, cnt * length(gram) AS covered
                FROM (SELECT doc_id, gram, cnt,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram ASC) AS rn
                      FROM counts)
                WHERE rn = 1)
            SELECT b.doc_id,
                   CASE WHEN n_lines > 0 THEN
                        round((n_lines - n_dlines)::DOUBLE / n_lines, 4)
                   ELSE 0.0 END AS dup_line_ratio,
                   CASE WHEN chars > 0 THEN
                        round((chars - dchars)::DOUBLE / chars, 4)
                   ELSE 0.0 END AS dup_line_char_ratio,
                   round(coalesce(t.covered::DOUBLE
                                  / greatest(b.n_chars, 1), 0.0), 4)
                       AS top_bigram_char_ratio
            FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
        """,
        # Every canonicalization rule replayed in RE2 (fragment, lowercase
        # scheme+host, default ports, tracking params, param sort, empty
        # path -> /).
        "url_canonical": r"""
            WITH built AS (
                SELECT doc_id,
                       'HTTP://Example.COM'
                       || CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END
                       || '/Path/' || CAST(doc_id AS VARCHAR)
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?utm_source=feed&b=2&a=1'
                               WHEN doc_id % 3 = 1
                               THEN '?z=9&a=1&fbclid=XYZ'
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
                           AS url
                FROM documents),
            s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u
                   FROM built),
            s2 AS (SELECT doc_id, u,
                          regexp_extract(u,
                              '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1)
                              AS head0
                   FROM s1),
            s3 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(lower(head0),
                              '^(http://[^:/]*):80$', '\1'),
                              '^(https://[^:/]*):443$', '\1') AS head,
                          substr(u, length(head0) + 1) AS rest
                   FROM s2),
            s4 AS (SELECT doc_id, head,
                          regexp_extract(rest, '^([^?]*)', 1) AS path,
                          regexp_extract(rest, '^[^?]*\?(.*)$', 1) AS query
                   FROM s3),
            s5 AS (SELECT doc_id, head, path,
                          array_to_string(list_sort(list_filter(
                              string_split(query, '&'),
                              p -> p <> '' AND NOT regexp_matches(p,
                                  '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)='))),
                              '&') AS qs
                   FROM s4)
            SELECT doc_id,
                   head || CASE WHEN path = '' THEN '/' ELSE path END
                        || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                       AS canon_url
            FROM s5
        """,
        # md5-bucket split arithmetic replayed exactly (2^60 divisor, same
        # cumulative thresholds — exactly-representable doubles by choice).
        "corpus_splits": """
            SELECT doc_id,
                   CASE WHEN u < 0.5 THEN 'train'
                        WHEN u < 0.75 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id,
                       ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM documents)
        """,
        # Replay of the CCNet line dedup: keyed on the LINE VALUE (exact,
        # collision-free), same (doc_id, pos) first-occurrence rule, same
        # blank passthrough and reassembly order, over the recrawl CTE.
        "dedup_lines": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
                FROM documents
            ), lines AS (
                SELECT doc_id, u.pos, u.ln FROM (
                    SELECT doc_id, string_split(text, chr(10)) AS lst FROM corpus
                ), UNNEST(list_transform(generate_series(1, len(lst)),
                                         j -> {'pos': j - 1, 'ln': lst[j]})) AS t(u)
            ), nb AS (
                SELECT doc_id, pos, ln
                FROM lines WHERE regexp_matches(ln, '[^ \\t\\r]')
            ), firsts AS (
                SELECT doc_id, pos, ln FROM (
                    SELECT doc_id, pos, ln,
                           row_number() OVER (PARTITION BY ln
                                              ORDER BY doc_id, pos) AS rn
                    FROM nb)
                WHERE rn = 1
            ), kept AS (
                SELECT doc_id, pos, ln FROM firsts
                UNION ALL
                SELECT doc_id, pos, ln FROM lines
                WHERE NOT regexp_matches(ln, '[^ \\t\\r]')
            ), reb AS (
                SELECT doc_id,
                       string_agg(ln, chr(10) ORDER BY pos) AS text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ), tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id
            )
            SELECT t.doc_id,
                   md5(coalesce(r.text, '')) AS dedup_md5,
                   t.n_lines,
                   coalesce(r.n_kept, 0)::BIGINT AS n_kept
            FROM tot t LEFT JOIN reb r USING (doc_id)
        """,
        # Reconstruct every parsed-WARC field from documents: url/date are
        # pure functions of doc_id, payload md5/bytes of text.
        # Domain language mix: counts + (n desc, lang) window replay.
        "domain_lang_mix": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       CASE WHEN doc_id % 11 = 0 THEN 'zz' ELSE lang END
                           AS lang
                FROM documents
            ), counts AS (
                SELECT domain, lang, count(*)::BIGINT AS n
                FROM pages GROUP BY domain, lang
            ), ranked AS (
                SELECT domain, lang, n,
                       row_number() OVER (PARTITION BY domain
                           ORDER BY n DESC, lang ASC NULLS LAST) AS r,
                       sum(n) OVER (PARTITION BY domain) AS tot
                FROM counts
            )
            SELECT domain, tot::BIGINT AS n_docs, lang AS majority_lang,
                   n AS n_majority,
                   round(n / tot::DOUBLE, 6) AS consistency,
                   (round(n / tot::DOUBLE, 6) < 0.8) AS is_mixed
            FROM ranked WHERE r = 1
        """,
        # Feed items: the fixture rows reconstruct arithmetically (the
        # page_meta arithmetic-replay convention) — two RSS items per 3k
        # page (orphan drops), one Atom entry per 3k+1 page.
        "feed_items": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 3 AS r
                FROM documents
            )
            SELECT 'https://feed.example/f' || s AS url,
                   'Post ' || s || 'a' AS item_title,
                   'https://feed.example/' || s || '/a' AS item_link,
                   'rss' AS kind
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://feed.example/f' || s,
                   'Post ' || s || 'b',
                   'https://feed.example/' || s || '/b', 'rss'
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://feed.example/f' || s,
                   'Entry ' || s,
                   'https://feed.example/' || s || '/atom', 'atom'
            FROM d WHERE r = 1
        """,
        # hreflang alternates: arithmetic replay — de (uppercased in the
        # page, folded) + fr (reversed attribute order) per page; the
        # stylesheet and hreflang-less alternates contribute nothing.
        "hreflang_alternates": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s FROM documents
            )
            SELECT 'https://x.example/en/' || s AS url, 'de' AS hreflang,
                   'https://x.example/de/' || s AS href
            FROM d
            UNION ALL
            SELECT 'https://x.example/en/' || s, 'fr',
                   'https://x.example/fr/' || s
            FROM d
        """,
        # Mojibake repair: golden-VALUES pure-Python replay per residue
        # class (the compression_ratio convention).
        "repair_mojibake": _mojibake_oracle(),
        # AMP twins: arithmetic replay of both edge directions.
        "amp_pairs": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 3 AS r
                FROM documents
            )
            SELECT 'https://e/p' || s AS url, FALSE AS is_amp,
                   'https://e/amp/' || s AS twin_url,
                   'amphtml' AS edge
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://e/p' || s, TRUE, 'https://e/' || s, 'canonical'
            FROM d WHERE r = 1
        """,
        # Declared language: arithmetic replay of the precedence ladder.
        "declared_lang": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 4 AS r
                FROM documents
            )
            SELECT 'https://e/l' || s AS url,
                   CASE r WHEN 0 THEN 'pt-br' WHEN 1 THEN 'fr, en'
                          WHEN 2 THEN 'de_de' END AS declared_lang_raw,
                   CASE r WHEN 0 THEN 'pt' WHEN 1 THEN 'fr'
                          WHEN 2 THEN 'de' END AS declared_lang,
                   CASE r WHEN 0 THEN 'html_lang' WHEN 1 THEN 'http_equiv'
                          WHEN 2 THEN 'og_locale' END AS declared_source
            FROM d
        """,
        # Shard manifest: md5-60 shard replay + ORDER BY inside
        # string_agg reproduces the sorted-concat checksum.
        "shard_manifest": r"""
            WITH h AS (
                SELECT ('0x' || substr(md5('epoch0:' ||
                           CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
                       coalesce(text, '') AS t
                FROM documents),
            m AS (
                SELECT (hv % 16)::INTEGER AS shard,
                       md5(t) AS dmd5,
                       length(t)::BIGINT AS chars,
                       len(regexp_extract_all(t,
                           '[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9\s]'
                       ))::BIGINT AS toks
                FROM h)
            SELECT shard, count(*)::BIGINT AS n_docs,
                   sum(toks)::BIGINT AS n_tokens,
                   sum(chars)::BIGINT AS n_chars,
                   md5(string_agg(dmd5, '' ORDER BY dmd5)) AS checksum
            FROM m GROUP BY shard
        """,
        # Media perceptual dedup: golden-VALUES python replay of the
        # class fingerprints and the one-hop min-label reps.
        "media_phash_dedup": _media_phash_oracle(),
        # Lang/script mismatch: script_ratios counting classes + the
        # expected-script CASE + the abstention rule, all in SQL.
        "lang_mismatch": """
            WITH s AS (
                SELECT doc_id, lang,
                       substr(text, 1, 30)
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' привет мир здравствуй'
                               WHEN doc_id % 4 = 1 THEN ' γειά σου κόσμε'
                               WHEN doc_id % 4 = 2 THEN ' 你好世界再见'
                               ELSE ' plain' END AS text
                FROM documents),
            c AS (
                SELECT doc_id, lang,
                       len(regexp_extract_all(text, '[A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ]'))::INT AS n_latin,
                       len(regexp_extract_all(text, '[Ѐ-ӿ]'))::INT AS n_cyrillic,
                       len(regexp_extract_all(text, '[Ͱ-Ͽ]'))::INT AS n_greek,
                       len(regexp_extract_all(text, '[一-鿿]'))::INT AS n_cjk
                FROM s),
            e AS (
                SELECT *,
                       n_latin + n_cyrillic + n_greek + n_cjk AS total,
                       CASE lang
                            WHEN 'en' THEN 'latin' WHEN 'fr' THEN 'latin'
                            WHEN 'de' THEN 'latin' WHEN 'es' THEN 'latin'
                            WHEN 'it' THEN 'latin' WHEN 'pt' THEN 'latin'
                            WHEN 'nl' THEN 'latin' WHEN 'la' THEN 'latin'
                            WHEN 'ru' THEN 'cyrillic' WHEN 'uk' THEN 'cyrillic'
                            WHEN 'bg' THEN 'cyrillic' WHEN 'sr' THEN 'cyrillic'
                            WHEN 'el' THEN 'greek'
                            WHEN 'zh' THEN 'cjk' WHEN 'ja' THEN 'cjk'
                            END AS expected_script,
                       CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk = 0
                            THEN NULL
                            WHEN n_latin >= greatest(n_cyrillic, n_greek, n_cjk)
                            THEN 'latin'
                            WHEN n_cyrillic >= greatest(n_greek, n_cjk)
                            THEN 'cyrillic'
                            WHEN n_greek >= n_cjk THEN 'greek'
                            ELSE 'cjk' END AS dominant_script
                FROM c)
            SELECT doc_id, lang, n_latin, n_cyrillic, n_greek, n_cjk,
                   dominant_script, expected_script,
                   CASE WHEN expected_script IS NULL OR total < 20
                        THEN NULL
                        ELSE dominant_script != expected_script
                        END AS mismatch
            FROM e
        """,
        # Heaps-law growth: min(batch) per type replaces the
        # cumulative-distinct scan; window sums over the 16-row result.
        "vocab_growth": """
            WITH toks AS (
                SELECT CAST(doc_id % 16 AS INT) AS batch,
                       unnest(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))
                           AS token
                FROM documents),
            vol AS (
                SELECT batch, count(*)::BIGINT AS batch_tokens
                FROM toks GROUP BY batch),
            first AS (
                SELECT token, min(batch) AS batch FROM toks GROUP BY token),
            fresh AS (
                SELECT batch, count(*)::BIGINT AS new_types
                FROM first GROUP BY batch),
            per AS (
                SELECT coalesce(v.batch, f.batch) AS batch,
                       coalesce(v.batch_tokens, 0)::BIGINT AS batch_tokens,
                       coalesce(f.new_types, 0)::BIGINT AS new_types
                FROM vol v FULL JOIN fresh f ON v.batch = f.batch)
            SELECT batch, batch_tokens, new_types,
                   (sum(batch_tokens) OVER w)::BIGINT AS cum_tokens,
                   (sum(new_types) OVER w)::BIGINT AS cum_types,
                   round((sum(new_types) OVER w)
                         / greatest(sum(batch_tokens) OVER w, 1)::DOUBLE,
                         6) AS type_token_ratio
            FROM per
            WINDOW w AS (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        # Line corrections: the same drop predicates as list_filter
        # lambdas (RE2 == Java on these ASCII-keyword patterns).
        "filter_lines": """
            WITH pages AS (
                SELECT doc_id,
                       substr(text, 1, 60) || chr(10)
                       || '1,234' || chr(10) || '42 likes' || chr(10)
                       || 'HOME | ABOUT | CONTACT' || chr(10)
                       || CASE WHEN doc_id % 3 = 0
                               THEN 'Please enable JavaScript now'
                               ELSE 'A second surviving prose line follows here.'
                               END
                       || chr(10) || substr(text, 61, 40) AS text
                FROM documents),
            k AS (
                SELECT doc_id,
                       len(string_split(text, chr(10)))::INT AS n_lines,
                       list_filter(
                           string_split(text, chr(10)),
                           x -> NOT (
                               regexp_matches(x,
                                   '(?:^[0-9 .,:/%()+-]*[0-9][0-9 .,:/%()+-]*$)'
                                   || '|(?:(?i)^ *[0-9]+ *(likes?|shares?|comments?|views?|votes?|replies|points?) *$)'
                                   || '|(?:^[^a-zà-öø-ÿ]*[A-Z][^a-zà-öø-ÿ]*$)')
                               OR (length(x) < 80 AND regexp_matches(x,
                                   '(?i)(javascript|cookies?|sign in|log in|subscribe|newsletter|read more|click here|all rights reserved)'))
                           )) AS keep
                FROM pages)
            SELECT doc_id,
                   array_to_string(keep, chr(10)) AS text,
                   n_lines,
                   (n_lines - len(keep))::INT AS n_dropped,
                   round((n_lines - len(keep))
                         / greatest(n_lines, 1)::DOUBLE, 6) AS drop_ratio,
                   (round((n_lines - len(keep))
                          / greatest(n_lines, 1)::DOUBLE, 6)
                    > 0.5) AS doc_flagged
            FROM k
        """,
        # Corpus diversity: full counts-of-counts replay — integer-exact
        # rank sums (HUGEINT vs decimal(38,0)) and micro-nat entropy
        # terms keep both engines order-independent.
        "corpus_diversity": """
            WITH pages AS (
                SELECT 'site' || CAST(least(doc_id % 16, doc_id % 7)
                                      AS VARCHAR) AS domain
                FROM documents),
            counts AS (
                SELECT domain, count(*)::BIGINT AS n
                FROM pages GROUP BY domain),
            cc AS (
                SELECT n, count(*)::BIGINT AS cnt FROM counts GROUP BY n),
            staged AS (
                SELECT n, cnt,
                       sum(cnt) OVER (ORDER BY n
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - cnt AS off,
                       sum(cnt) OVER (ORDER BY n DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum_desc
                FROM cc),
            agg AS (
                SELECT sum(n * cnt)::BIGINT AS n_pages,
                       sum(cnt)::BIGINT AS n_groups,
                       sum((n::HUGEINT) * cnt * (2 * off + cnt + 1))
                           AS rank_sum2,
                       max(n) AS max_n,
                       sum(greatest(least(10, cum_desc)
                                    - (cum_desc - cnt), 0) * n)::BIGINT
                           AS top_n_pages,
                       sum(round(ln(n) * 1e6)::HUGEINT * n * cnt)
                           AS nlogn_micro
                FROM staged),
            ent AS (
                SELECT *,
                       round(ln(n_pages::DOUBLE)
                             - (nlogn_micro::DOUBLE / 1e6)
                               / n_pages::DOUBLE, 6) AS entropy
                FROM agg)
            SELECT n_pages, n_groups, entropy,
                   round(exp(entropy), 6) AS effective_groups,
                   round(rank_sum2::DOUBLE
                         / (n_groups::DOUBLE * n_pages::DOUBLE)
                         - (n_groups + 1.0::DOUBLE) / n_groups, 6) AS gini,
                   round(max_n / n_pages::DOUBLE, 6) AS top1_share,
                   round(top_n_pages / n_pages::DOUBLE, 6) AS topn_share
            FROM ent
        """,
        # Gate attrition: each cumulative conjunction is a SUM(CASE) in
        # one aggregate; the funnel pivots via VALUES.
        "gate_attrition": r"""
            WITH g AS (
                SELECT (len(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) >= 20) AS g1,
                       (round(length(regexp_replace(text,
                            '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                            / greatest(length(text), 1), 6) >= 0.6) AS g2,
                       (NOT contains(text, '{')) AS g3,
                       regexp_matches(lang, '^[a-z]{2}$') AS g4
                FROM documents
            ), s AS (
                SELECT count(*)::BIGINT AS n0,
                       sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                       sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)::BIGINT
                           AS n2,
                       sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0
                           END)::BIGINT AS n3,
                       sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0
                           END)::BIGINT AS n4
                FROM g
            )
            SELECT v.gate_idx::INT AS gate_idx, v.gate,
                   CASE v.gate_idx WHEN 1 THEN n0 WHEN 2 THEN n1
                        WHEN 3 THEN n2 ELSE n3 END AS n_in,
                   CASE v.gate_idx WHEN 1 THEN n1 WHEN 2 THEN n2
                        WHEN 3 THEN n3 ELSE n4 END AS n_pass,
                   CASE v.gate_idx WHEN 1 THEN n0 - n1 WHEN 2 THEN n1 - n2
                        WHEN 3 THEN n2 - n3 ELSE n3 - n4 END AS n_killed,
                   round(CASE v.gate_idx WHEN 1 THEN n1 WHEN 2 THEN n2
                         WHEN 3 THEN n3 ELSE n4 END
                         / greatest(n0, 1)::DOUBLE, 6) AS cum_survival
            FROM s, (VALUES (1, 'min_words'), (2, 'alpha_ratio'),
                            (3, 'no_braces'), (4, 'lang_known'))
                 AS v(gate_idx, gate)
        """,
        # Leakage-safe splits: cluster = id mod 1e6 on the planted pair
        # graph; the split replays the same md5 unit-hash thresholds as
        # corpus_splits, keyed on the CLUSTER label.
        "leakage_safe_splits": """
            WITH corpus AS (
                SELECT doc_id FROM documents
                UNION ALL
                SELECT doc_id + 1000000 FROM documents
            ), labeled AS (
                SELECT doc_id, (doc_id % 1000000)::BIGINT AS cluster
                FROM corpus
            )
            SELECT doc_id, cluster,
                   CASE WHEN u < 0.5 THEN 'train'
                        WHEN u < 0.75 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id, cluster,
                       ('0x' || substr(md5('split:'
                            || CAST(cluster AS VARCHAR)), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM labeled)
        """,
        # Publish dates: the fixture's resolution ladder replays
        # arithmetically — meta (incl. the malformed row), JSON-LD, URL
        # path date, none; TRY_CAST mirrors try_to_date's NULL-on-junk.
        "publish_dates": """
            WITH base AS (
                SELECT doc_id,
                       CAST(2020 + doc_id % 6 AS VARCHAR) || '-'
                       || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
                       || '-'
                       || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                           AS iso,
                       (doc_id % 4) AS r
                FROM documents
            ), resolved AS (
                SELECT doc_id, r, iso,
                       CASE WHEN r = 0 THEN
                                CASE WHEN doc_id % 3 = 0 THEN 'not-a-date'
                                     ELSE iso || 'T10:00:00Z' END
                            WHEN r = 1 THEN iso
                            WHEN r = 2 THEN iso
                       END AS published_raw,
                       CASE WHEN r = 0 THEN 'meta'
                            WHEN r = 1 THEN 'jsonld'
                            WHEN r = 2 THEN 'url' END AS published_src
                FROM base
            )
            SELECT CASE WHEN r = 2 THEN
                       'https://blog.example/' || replace(iso, '-', '/')
                       || '/post-' || CAST(doc_id AS VARCHAR) || '.html'
                   ELSE 'https://site.example/p' || CAST(doc_id AS VARCHAR)
                   END AS url,
                   published_raw,
                   published_src,
                   TRY_CAST(substr(published_raw, 1, 10) AS DATE)
                       AS published_date
            FROM resolved
        """,
        # Link reciprocity: the ring/chord construction, the distinct
        # edge set, the reversed semi-join and the outdegree ratio all
        # replay as plain SQL.
        "link_reciprocity": """
            WITH raw_edges AS (
                SELECT 's' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS src,
                       's' || CAST(CASE WHEN doc_id % 2 = 0
                                        THEN (doc_id % 7 + 1) % 7
                                        ELSE (doc_id % 7 + 6) % 7 END
                                   AS VARCHAR) || '.example' AS dst
                FROM documents
                UNION ALL
                SELECT 's' || CAST(doc_id % 7 AS VARCHAR) || '.example',
                       's' || CAST((doc_id % 7 + 3) % 7 AS VARCHAR)
                           || '.example'
                FROM documents WHERE doc_id % 5 = 0
            ), e AS (
                SELECT DISTINCT src, dst FROM raw_edges WHERE src != dst
            ), recip AS (
                SELECT a.src, a.dst FROM e a
                SEMI JOIN e b ON a.src = b.dst AND a.dst = b.src
            ), outs AS (
                SELECT src, count(*)::BIGINT AS n_out FROM e GROUP BY src
            ), recs AS (
                SELECT src, count(*)::BIGINT AS n_recip
                FROM recip GROUP BY src
            )
            SELECT o.src AS domain, o.n_out,
                   coalesce(r.n_recip, 0)::BIGINT AS n_recip,
                   round(coalesce(r.n_recip, 0) / o.n_out::DOUBLE, 6)
                       AS reciprocity
            FROM outs o LEFT JOIN recs r ON o.src = r.src
        """,
        # WET round-trip: conversion records carry the raw text bytes, so
        # url/date/md5/length all reconstruct arithmetically.
        "wet_roundtrip": """
            SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   strftime(TIMESTAMP '2024-01-01 00:00:00'
                            + INTERVAL (doc_id) SECOND,
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   'conversion' AS record_type,
                   md5(text) AS text_md5,
                   strlen(text)::BIGINT AS n_bytes
            FROM documents
        """,
        # Edit verification: DuckDB levenshtein is the same unit-cost edit
        # distance; prefixes, the 6-dp similarity, and the 0.75 verdict
        # mirror the operator exactly.
        "edit_verify_pairs": r"""
            WITH m AS (
                SELECT doc_id,
                       substr(text, 1, 300) AS pa,
                       substr(regexp_replace(text, '\s+\S+\s*$', ''),
                              1, 300) AS pb
                FROM documents
            )
            SELECT doc_id AS id_a,
                   (doc_id + 1000000)::BIGINT AS id_b,
                   levenshtein(pa, pb)::INT AS edit_dist,
                   round(CASE WHEN greatest(len(pa), len(pb)) = 0 THEN 1.0
                         ELSE 1.0 - levenshtein(pa, pb)
                              / greatest(len(pa), len(pb))::DOUBLE END,
                         6) AS sim,
                   (round(CASE WHEN greatest(len(pa), len(pb)) = 0 THEN 1.0
                          ELSE 1.0 - levenshtein(pa, pb)
                               / greatest(len(pa), len(pb))::DOUBLE END,
                          6) >= 0.75) AS is_dup
            FROM m
        """,
        # Keep-best survivors: the planted pair graph {i, i+1e6} makes the
        # component label arithmetic (id mod 1e6); the (score desc, id)
        # window replays the survivor policy.
        "dedup_best_survivors": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), scored AS (
                SELECT doc_id,
                       (doc_id % 1000000)::BIGINT AS cluster,
                       len(regexp_extract_all(lower(text),
                           '[a-zà-öø-ÿ]+'))::BIGINT AS score
                FROM corpus
            )
            SELECT doc_id, cluster, score,
                   (row_number() OVER (PARTITION BY cluster
                        ORDER BY score DESC, doc_id) = 1) AS keep
            FROM scored
        """,
        # Sitemap discovery: RE2 (?im)^ anchors after \n only, which is
        # exactly what the Spark side's (?dim) pins Java to.
        "robots_sitemap_urls": r"""
            WITH r AS (
                SELECT DISTINCT (doc_id % 13) AS r FROM documents
            ), b AS (
                SELECT 'site' || CAST(r AS VARCHAR) || '.example' AS domain,
                       CASE WHEN r % 3 = 0 THEN
                           'User-agent: *' || chr(10) || 'Disallow: /x'
                           || chr(10) || 'Sitemap: https://site'
                           || CAST(r AS VARCHAR) || '.example/sitemap.xml'
                           || chr(10) || chr(9) || 'SITEMAP:' || chr(9)
                           || 'https://site' || CAST(r AS VARCHAR)
                           || '.example/news.xml' || chr(10)
                       WHEN r % 3 = 1 THEN
                           'sitemap: https://site' || CAST(r AS VARCHAR)
                           || '.example/s.xml # primary' || chr(10)
                           || 'NotSitemap: https://decoy.example/no.xml'
                           || chr(10) || 'Sitemap: https://site'
                           || CAST(r AS VARCHAR) || '.example/s.xml'
                           || chr(10)
                       ELSE 'User-agent: *' || chr(10)
                           || 'Disallow: /private/' || chr(10) END AS body
                FROM r
            )
            SELECT DISTINCT domain, u AS sitemap_url
            FROM b, UNNEST(regexp_extract_all(body,
                '(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t\r\n#]+)', 1)) AS t(u)
        """,
        # Unigram KL drift: add-one smoothing over the union vocab,
        # nano-nat quantization floor(x*1e9 + 0.5) with the same
        # multiplication order, (|contrib| desc, token) top-20.
        "unigram_drift": r"""
            WITH oldc AS (
                SELECT u AS token, count(*)::BIGINT AS c_old
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) AS t(u)
                GROUP BY u
            ), newdocs AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN
                           text || ' cookie banner accept tracking'
                       ELSE text END AS text
                FROM documents
            ), newc AS (
                SELECT u AS token, count(*)::BIGINT AS c_new
                FROM newdocs,
                     UNNEST(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) AS t(u)
                GROUP BY u
            ), j AS (
                SELECT coalesce(o.token, n.token) AS token,
                       coalesce(c_old, 0)::BIGINT AS c_old,
                       coalesce(c_new, 0)::BIGINT AS c_new
                FROM oldc o FULL OUTER JOIN newc n ON o.token = n.token
            ), tot AS (
                SELECT sum(c_old)::BIGINT AS no_, sum(c_new)::BIGINT AS nn,
                       count(*)::BIGINT AS v
                FROM j
            ), contrib AS (
                SELECT token, c_old, c_new,
                       floor((c_new + 1.0) / (nn + v)
                             * ln(((c_new + 1.0) / (nn + v))
                                  / ((c_old + 1.0) / (no_ + v)))
                             * 1e9 + 0.5)::BIGINT AS contrib_nano
                FROM j CROSS JOIN tot
            )
            SELECT token, c_old, c_new, contrib_nano
            FROM contrib
            ORDER BY abs(contrib_nano) DESC, token
            LIMIT 20
        """,
        "warc_roundtrip": """
            SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   strftime(TIMESTAMP '2024-01-01 00:00:00'
                            + INTERVAL (doc_id) SECOND,
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   md5('<html><body>' || text || '</body></html>') AS html_md5,
                   strlen('<html><body>' || text || '</body></html>')::BIGINT
                       AS n_bytes
            FROM documents
        """,
        # text passes through tf.train.Example bytes features losslessly
        # (valid UTF-8 in == same bytes out); the float32 feature is
        # replayed by the REAL cast (doc_id/4 is f32-exact anyway).
        "tfrecord_roundtrip": """
            SELECT 'tfr://doc/' || CAST(doc_id AS VARCHAR) AS url,
                   md5(coalesce(text, '')) AS text_md5,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   CAST(doc_id / 4.0 AS REAL)::DOUBLE AS score_f32
            FROM documents
        """,
        # utf8proc NFC over the same combining-acute construction; changed
        # is always true (the suffix denormalizes every doc).
        "unicode_nfc": """
            SELECT doc_id,
                   md5(nfc_normalize(text || ' cafe' || chr(769) || ' '
                                     || chr(64257) || 'n 2' || chr(185)))
                       AS norm_md5,
                   (text || ' cafe' || chr(769)
                    <> nfc_normalize(text || ' cafe' || chr(769))) AS changed
            FROM documents
        """,
        # Proportional quota: rate = least(1, 20/n_domain); membership =
        # md5-unit-hash(quota:id) < rate — identical double arithmetic.
        "domain_quota": """
            WITH d AS (
                SELECT doc_id,
                       'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain
                FROM documents
            ), caps AS (
                SELECT domain, count(*)::BIGINT AS n_domain FROM d GROUP BY domain
            )
            SELECT d.doc_id, d.domain
            FROM d JOIN caps USING (domain)
            WHERE ('0x' || substr(md5('quota:' || CAST(d.doc_id AS VARCHAR)),
                                  1, 15))::BIGINT
                  / 1152921504606846976.0
                  < least(1.0, 20.0 / caps.n_domain)
        """,
        # Exact cap: the 20 smallest md5 id-hashes per domain survive.
        "domain_caps": """
            WITH d AS (
                SELECT doc_id,
                       'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain,
                       ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM documents
            )
            SELECT doc_id, domain
            FROM (SELECT doc_id, domain,
                         row_number() OVER (PARTITION BY domain
                                            ORDER BY h ASC, doc_id ASC) AS rn
                  FROM d)
            WHERE rn <= 20
        """,
        # quantile_cont interpolates identically to Spark's exact
        # percentile ((n-1)*p linear), verified bit-for-bit.
        "length_quantiles": """
            SELECT lang,
                   count(*)::BIGINT AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99_chars
            FROM documents GROUP BY lang
        """,
        "blocked_urls": """
            SELECT doc_id,
                   'http://sub.site' || CAST(doc_id % 13 AS VARCHAR)
                       || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
            FROM documents
            WHERE doc_id % 13 NOT IN (1, 4, 11)
        """,
        # Top-200 vocab by (count desc, word asc) — a total order, so the
        # set is engine-identical; per-doc OOV counts under it.
        "vocab_oov": """
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+')) AS word
                FROM documents
            ), vocab AS (
                SELECT word FROM (
                    SELECT word, count(*) AS n FROM words GROUP BY word
                ) ORDER BY n DESC, word ASC LIMIT 200
            ), sc AS (
                SELECT w.doc_id,
                       count(*)::BIGINT AS n_words,
                       (count(*) - count(v.word))::BIGINT AS n_oov
                FROM words w LEFT JOIN vocab v USING (word)
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   coalesce(s.n_words, 0)::BIGINT AS n_words,
                   coalesce(s.n_oov, 0)::BIGINT AS n_oov
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        # Full replay of the char-bigram LM: same normalization, same
        # add-one smoothing, same integer micro-nat costs.  Train corpus =
        # score corpus here, so every scored bigram is in the model and
        # the inner join is total (the floor/uniform fallbacks only fire
        # with a separate train split — unit-tested instead).
        # sampling.quantile_normalize replica: same (score, id) tie
        # order on both rankings, same integer midpoint-quantile index.
        "quantile_normalize": """
            WITH d AS (SELECT doc_id, lang, n_chars AS s FROM documents),
            p AS (SELECT s, row_number() OVER (ORDER BY s, doc_id) AS g
                  FROM d),
            n AS (SELECT count(*)::HUGEINT AS N FROM d),
            r AS (SELECT doc_id, lang, s,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY s, doc_id) AS rk,
                         count(*) OVER (PARTITION BY lang) AS cnt
                  FROM d)
            SELECT r.doc_id, r.lang, r.s::BIGINT AS n_chars,
                   p.s::BIGINT AS norm_score
            FROM r CROSS JOIN n
            JOIN p ON p.g = ((2 * r.rk - 1)::HUGEINT * n.N)
                          // (2 * r.cnt)::HUGEINT + 1
        """,
        # evaluate.chi2_independence replica: q and den exact HUGEINTs,
        # the cell term the identical double association
        # (q::D * q::D / den::D) * 1e9, nano-rounded then integer-summed.
        "chi2_lang_source": f"""
            {_CHI2_CELLS_SQL}
            SELECT max(n)::BIGINT AS n,
                   count(DISTINCT a)::BIGINT AS a_levels,
                   count(DISTINCT b)::BIGINT AS b_levels,
                   ((count(DISTINCT a) - 1)
                    * (count(DISTINCT b) - 1))::BIGINT AS dof,
                   sum(t)::BIGINT AS chi2_nano
            FROM cells
        """,
        # chi2 chain + the V tail: round(sqrt((chi2/1e9)/(n*m))*1e6).
        "cramers_v": f"""
            {_CHI2_CELLS_SQL},
            agg AS (SELECT max(n)::BIGINT AS n,
                           count(DISTINCT a)::BIGINT AS a_levels,
                           count(DISTINCT b)::BIGINT AS b_levels,
                           sum(t)::BIGINT AS chi2_nano
                    FROM cells)
            SELECT n, a_levels, b_levels,
                   ((a_levels - 1) * (b_levels - 1))::BIGINT AS dof,
                   chi2_nano,
                   CASE WHEN least(a_levels - 1, b_levels - 1) > 0 THEN
                       CAST(round(sqrt((chi2_nano::DOUBLE / 1e9)
                                       / (n * least(a_levels - 1,
                                                    b_levels - 1))::DOUBLE)
                                  * 1e6, 0) AS BIGINT)
                   END AS v_micro
            FROM agg
        """,
        # similarity.colbert_maxsim term for term: micro-unit cosines,
        # max per (query token, doc), integer sum per (query, doc).
        "colbert_maxsim": f"""
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT label AS qid, vec_id AS qtok, v FROM e
                  WHERE label <= 1),
            d AS (SELECT label AS did, v FROM e),
            sc AS (SELECT q.qid, q.qtok, d.did,
                          round({_COSINE.format(a='q.v', b='d.v')}
                                * 1000000, 0)::BIGINT AS c6
                   FROM q CROSS JOIN d),
            mx AS (SELECT qid, qtok, did, max(c6) AS m
                   FROM sc GROUP BY 1, 2, 3)
            SELECT qid::BIGINT AS qid, did::BIGINT AS did,
                   count(*)::BIGINT AS n_qtokens,
                   sum(m)::BIGINT AS maxsim_micro
            FROM mx GROUP BY 1, 2
        """,
        # textstats.credit_card_hits replica: same maximal-run regex (no
        # lookaround, Java == RE2), same separator strip, same reversed
        # positional Luhn arithmetic in list lambdas.
        "luhn_card_audit": """
            WITH injected AS (
                SELECT doc_id,
                       coalesce(text, '') ||
                       CASE doc_id % 4
                         WHEN 0 THEN ' card 4532015112830366 end'
                         WHEN 1 THEN ' card 4532015112830367 end'
                         WHEN 2 THEN ' card 4532 0151 1283 0366 end'
                         ELSE ''
                       END AS text
                FROM documents),
            runs AS (
                SELECT doc_id,
                       regexp_extract_all(text,
                                          '[0-9][0-9 -]{11,30}[0-9]') AS rs
                FROM injected),
            checked AS (
                SELECT doc_id, rs,
                       list_filter(
                           list_transform(rs,
                               r -> replace(replace(r, ' ', ''),
                                            '-', '')),
                           d -> length(d) BETWEEN 13 AND 19
                                AND list_sum(list_transform(
                                        range(1, length(d) + 1),
                                        i -> CASE WHEN i % 2 = 0 THEN
                                                 CASE WHEN (ascii(
                                                     reverse(d)[i]) - 48)
                                                     * 2 > 9
                                                 THEN (ascii(reverse(d)[i])
                                                       - 48) * 2 - 9
                                                 ELSE (ascii(reverse(d)[i])
                                                       - 48) * 2
                                                 END
                                             ELSE ascii(reverse(d)[i]) - 48
                                             END)) % 10 = 0) AS ok
                FROM runs)
            SELECT doc_id, len(rs)::INT AS n_card_candidates,
                   len(ok)::INT AS n_cards_valid
            FROM checked
        """,
        # dedup.text_reuse_spans replica on shingle STRINGS: same
        # plagiarist construction, same within-doc-unique filter, same
        # diagonal rollup; 1-based oracle positions vs 0-based Spark
        # positions cancel in every output column.
    }
