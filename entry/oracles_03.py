"""Oracle SQL fragments (part 3/4 of the mechanical __spark_entry__ split; entries verbatim)."""
from __future__ import annotations

from entry.queries_02 import _epub_export_oracle, _epub_roundtrip_oracle, _hits_oracle, _project_embeddings_oracle
from entry.queries_05 import _CONTAM_SPANS_SQL_CORE, _isotonic_oracle, _payload_routing_oracle
from entry.oracle_helpers import _COSINE, _GOPHER_ORACLE, _bpe_encode_oracle, _bpe_fertility_oracle, _bpe_merges_oracle, _dsir_weights_oracle, _encoding_signals_oracle, _extraction_eval_oracle, _extraction_oracles, _ivf_topk_oracle, _kmeans_profile_oracle, _license_signals_oracle, _lsh_topk_oracle, _media_features_oracle, _ocr_artifacts_oracle, _semantic_dedup_oracle, _shingle_jaccard_oracle, _simhash_oracle, _wordpiece_symbols_oracle


def oracles() -> dict[str, str]:
    return {
        "text_reuse_spans": """
            WITH base AS (SELECT doc_id, coalesce(text, '') AS text
                          FROM documents),
            bt AS (SELECT doc_id,
                          regexp_split_to_array(trim(lower(text)),
                                                '\\s+') AS ws
                   FROM base),
            plag AS (SELECT doc_id + 2000000 AS doc_id,
                            array_to_string(
                                list_transform(range(0, 10),
                                    j -> 'filler' || doc_id::VARCHAR
                                         || 'x' || j::VARCHAR)
                                || ws[21:50], ' ') AS text
                     FROM bt),
            corpus AS (SELECT doc_id, text FROM base
                       UNION ALL SELECT doc_id, text FROM plag),
            toks AS (SELECT doc_id,
                            regexp_split_to_array(trim(lower(text)),
                                                  '\\s+') AS ws
                     FROM corpus),
            occ AS (SELECT doc_id, i,
                           array_to_string(ws[i:i+4], ' ') AS sh
                    FROM (SELECT doc_id, ws,
                                 unnest(generate_series(1, len(ws) - 4))
                                     AS i
                          FROM toks WHERE len(ws) >= 5)),
            uniq AS (SELECT doc_id, sh, min(i) AS pos FROM occ
                     GROUP BY 1, 2 HAVING count(*) = 1),
            pairs AS (SELECT doc_id AS id_a, doc_id + 2000000 AS id_b
                      FROM base),
            m AS (SELECT p.id_a, p.id_b, a.pos AS pa, b.pos AS pb
                  FROM pairs p
                  JOIN uniq a ON a.doc_id = p.id_a
                  JOIN uniq b ON b.doc_id = p.id_b AND b.sh = a.sh),
            g AS (SELECT id_a, id_b, pa - pb AS diag, count(*) AS n,
                         min(pa) AS a0, max(pa) AS a1
                  FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 3)
            SELECT id_a, id_b, diag::BIGINT AS diag,
                   a0::BIGINT AS a_start, (a1 + 4)::BIGINT AS a_end,
                   (a0 - diag)::BIGINT AS b_start,
                   (a1 + 4 - diag)::BIGINT AS b_end,
                   n::BIGINT AS n_shingles
            FROM g
        """,
        # two-stage passim replica: string-shingle alignment (as in
        # text_reuse_spans) over the insertion fixture, then the same
        # prev-max window interval merge with gap bridging.
        "text_reuse_merged": """
            WITH base AS (SELECT doc_id, coalesce(text, '') AS text
                          FROM documents),
            bt AS (SELECT doc_id,
                          regexp_split_to_array(trim(lower(text)),
                                                '\\s+') AS ws
                   FROM base),
            plag AS (SELECT doc_id + 3000000 AS doc_id,
                            array_to_string(
                                list_transform(range(0, 10),
                                    j -> 'gfill' || doc_id::VARCHAR
                                         || 'x' || j::VARCHAR)
                                || ws[21:35]
                                || ['zzins' || doc_id::VARCHAR]
                                || ws[36:50], ' ') AS text
                     FROM bt),
            corpus AS (SELECT doc_id, text FROM base
                       UNION ALL SELECT doc_id, text FROM plag),
            toks AS (SELECT doc_id,
                            regexp_split_to_array(trim(lower(text)),
                                                  '\\s+') AS ws
                     FROM corpus),
            occ AS (SELECT doc_id, i,
                           array_to_string(ws[i:i+4], ' ') AS sh
                    FROM (SELECT doc_id, ws,
                                 unnest(generate_series(1, len(ws) - 4))
                                     AS i
                          FROM toks WHERE len(ws) >= 5)),
            uniq AS (SELECT doc_id, sh, min(i) AS pos FROM occ
                     GROUP BY 1, 2 HAVING count(*) = 1),
            pairs AS (SELECT doc_id AS id_a, doc_id + 3000000 AS id_b
                      FROM base),
            m AS (SELECT p.id_a, p.id_b, a.pos AS pa, b.pos AS pb
                  FROM pairs p
                  JOIN uniq a ON a.doc_id = p.id_a
                  JOIN uniq b ON b.doc_id = p.id_b AND b.sh = a.sh),
            g AS (SELECT id_a, id_b, pa - pb AS diag, count(*) AS n,
                         min(pa) AS a0, max(pa) AS a1
                  FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 3),
            spans AS (SELECT DISTINCT id_a, id_b,
                             a0 AS a_start, a1 + 4 AS a_end,
                             a0 - diag AS b_start,
                             a1 + 4 - diag AS b_end,
                             n AS n_shingles
                      FROM g),
            flagged AS (
                SELECT *, CASE WHEN pm IS NULL
                                    OR a_start > pm + 1 + 8
                               THEN 1 ELSE 0 END AS flag
                FROM (SELECT *,
                             max(a_end) OVER (
                                 PARTITION BY id_a, id_b
                                 ORDER BY a_start, a_end
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS pm
                      FROM spans)),
            ig AS (SELECT *,
                          sum(flag) OVER (
                              PARTITION BY id_a, id_b
                              ORDER BY a_start, a_end
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS grp
                   FROM flagged)
            SELECT id_a, id_b,
                   min(a_start)::BIGINT AS a_start,
                   max(a_end)::BIGINT AS a_end,
                   min(b_start)::BIGINT AS b_start,
                   max(b_end)::BIGINT AS b_end,
                   count(*)::BIGINT AS n_runs,
                   sum(n_shingles)::BIGINT AS n_shingles
            FROM ig GROUP BY id_a, id_b, grp
        """,
        # lm.good_turing term for term: exact-integer floor division
        # (HUGEINT // == DECIMAL(38,0) div for non-negative operands).
        "good_turing": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-z\u00e0-\u00f6\u00f8-\u00ff]+')) AS word
                FROM documents),
            counts AS (SELECT word, count(*)::HUGEINT AS r
                       FROM toks GROUP BY 1),
            fof AS (SELECT r, count(*)::HUGEINT AS n_r
                    FROM counts GROUP BY 1),
            tot AS (SELECT sum(r * n_r)::HUGEINT AS t FROM fof)
            SELECT f.r::BIGINT AS r, f.n_r::BIGINT AS n_r,
                   ((1000000::HUGEINT * (f.r + 1) * nx.n_r)
                    // f.n_r)::BIGINT AS r_star_micro,
                   ((1000000000::HUGEINT * (f.r + 1) * nx.n_r)
                    // (f.n_r * t.t))::BIGINT AS p_gt_nano
            FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
            CROSS JOIN tot t
        """,
        # global-order pairs via one window; the Spark side's range
        # partition + offset lift produces the identical total order.
        "snm_candidate_pairs": """
            WITH d AS (
                SELECT doc_id,
                       substr(regexp_replace(lower(text), '[^a-z]', '',
                                             'g'), 1, 12) AS k
                FROM documents),
            o AS (SELECT doc_id, k,
                         row_number() OVER (ORDER BY k, doc_id) AS g
                  FROM d)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.k AS key_a, b.k AS key_b,
                   (b.g - a.g)::BIGINT AS gap
            FROM o a JOIN o b ON b.g > a.g AND b.g <= a.g + 3
        """,
        # lm.train_kn_bigram + kn_bigram_scores replica: same top-64
        # vocab (ties n desc, word asc), same exact-rational P(w2|w1) =
        # (max(4c12-3,0)*n1all + 3*n1f*n1b)/(4*c1*n1all), one
        # correctly-rounded ln of exact integers per pair, integer
        # micro-nat doc sums; the uniform fallback constant is the same
        # Python-computed literal both engines embed.
        "kn_doc_scores": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-z\u00e0-\u00f6\u00f8-\u00ff]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          sum(cost)::BIGINT AS cost_micro_total
                   FROM costs GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(s.cost_micro_total, 0)::BIGINT
                       AS cost_micro_total
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        # lm_partition over the KN doc scores: identical CTE chain to
        # kn_doc_scores, then the same 6-dp mean / quantile_cont tertile
        # tail as the lm_partition oracle.
        "kn_partition": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          sum(cost)::BIGINT AS cost_micro_total
                   FROM costs GROUP BY 1),
            means AS (
                SELECT d.doc_id,
                       coalesce(s.n_bigrams, 0) AS n_bigrams,
                       round(coalesce(s.cost_micro_total, 0)::DOUBLE
                             / greatest(coalesce(s.n_bigrams, 0), 1) / 1e6,
                             6) AS mean_nats
                FROM documents d LEFT JOIN sc s USING (doc_id)
            ), cuts AS (
                SELECT round(quantile_cont(mean_nats, 1.0/3), 6) AS c1,
                       round(quantile_cont(mean_nats, 2.0/3), 6) AS c2
                FROM means WHERE n_bigrams > 0
            )
            SELECT m.doc_id, m.mean_nats,
                   CASE WHEN m.n_bigrams = 0 THEN 'tail'
                        WHEN m.mean_nats <= c.c1 THEN 'head'
                        WHEN m.mean_nats <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM means m CROSS JOIN cuts c
        """,
        # Min-K% Prob (Shi et al. 2024): same KN cost chain, then per
        # doc the sum of the top-ceil(n/5) costs BY VALUE (tie order
        # can't change a sum); exact-integer ceil; the 6-dp mean is the
        # only float.
        "mink_prob_audit": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-z\u00e0-\u00f6\u00f8-\u00ff]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          list(cost ORDER BY cost DESC) AS cs
                   FROM costs GROUP BY 1),
            mk AS (SELECT doc_id, n_bigrams,
                          ((n_bigrams * 20 + 99) // 100)::BIGINT AS mink_n,
                          coalesce(list_sum(list_slice(
                              cs, 1,
                              ((n_bigrams * 20 + 99) // 100)::INT)),
                              0)::BIGINT AS mink_cost_micro
                   FROM sc)
            SELECT d.doc_id,
                   coalesce(m.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(m.mink_n, 0)::BIGINT AS mink_n,
                   coalesce(m.mink_cost_micro, 0)::BIGINT AS mink_cost_micro,
                   CASE WHEN coalesce(m.mink_n, 0) > 0 THEN
                       round(m.mink_cost_micro::DOUBLE
                             / m.mink_n::DOUBLE / 1e6, 6) + 0
                   END::DOUBLE AS mink_mean_nats
            FROM documents d LEFT JOIN mk m USING (doc_id)
        """,
        # ARPA export: same word-level KN count chain; continuation
        # unigrams, 3·n1f/(4·c1) backoffs, full interpolated bigram
        # probs — all signed micro-nats of exact-integer rationals.
        "kn_arpa_table": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            words AS (
                SELECT word FROM vocab
                UNION ALL SELECT '<unk>'),
            uni AS (
                SELECT 1 AS ngram_order, w.word AS ngram,
                       CASE WHEN cont.n1b IS NOT NULL THEN
                           CAST(round(ln(cont.n1b::DOUBLE
                                         / sca.n1all::DOUBLE) * 1e6)
                                AS BIGINT)
                       END AS logp_micro_nats,
                       CASE WHEN ctx.c1 IS NOT NULL THEN
                           CAST(round(ln((3 * ctx.n1f)::DOUBLE
                                         / (4 * ctx.c1)::DOUBLE) * 1e6)
                                AS BIGINT)
                       END AS backoff_micro_nats
                FROM words w
                LEFT JOIN cont ON cont.w2 = w.word
                LEFT JOIN ctx ON ctx.w1 = w.word
                CROSS JOIN sca),
            bi AS (
                SELECT 2 AS ngram_order,
                       pc.w1 || ' ' || pc.w2 AS ngram,
                       CAST(round(ln(
                           (greatest(4 * pc.c12 - 3, 0) * sca.n1all
                            + 3 * ctx.n1f * cont.n1b)::DOUBLE
                           / (4 * ctx.c1 * sca.n1all)::DOUBLE) * 1e6)
                            AS BIGINT) AS logp_micro_nats,
                       NULL::BIGINT AS backoff_micro_nats
                FROM pc
                JOIN ctx ON ctx.w1 = pc.w1
                JOIN cont ON cont.w2 = pc.w2
                CROSS JOIN sca)
            SELECT * FROM uni UNION ALL SELECT * FROM bi
        """,
        "bigram_lm_scores": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z ]', '#', 'g') AS s
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, length(s) - 1),
                                             i -> s[i:i+1])) AS bg
                FROM norm WHERE length(s) >= 2
            ), counts AS (
                SELECT bg, count(*)::BIGINT AS n_bg FROM bg GROUP BY bg
            ), c1 AS (
                SELECT substr(bg, 1, 1) AS c1, sum(n_bg)::BIGINT AS n_c1
                FROM counts GROUP BY 1
            ), model AS (
                SELECT bg,
                       CAST(round(-ln((n_bg + 1.0) / (n_c1 + 28.0)) * 1000000)
                            AS BIGINT) AS cost
                FROM counts JOIN c1 ON substr(counts.bg, 1, 1) = c1.c1
            ), scored AS (
                SELECT b.doc_id,
                       count(*)::BIGINT AS n_bigrams,
                       sum(m.cost)::BIGINT AS cost_micro_total
                FROM bg b JOIN model m USING (bg)
                GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(s.cost_micro_total, 0)::BIGINT AS cost_micro_total
            FROM documents d LEFT JOIN scored s USING (doc_id)
        """,
        # CCNet head/middle/tail thirds over the same LM replica: mean
        # nats rounded to 6 dp, tertile cutoffs = quantile_cont (the same
        # p*(n-1) linear interpolation as Spark's exact percentile), also
        # rounded before the boundary compare.
        "lm_partition": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z ]', '#', 'g') AS s
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, length(s) - 1),
                                             i -> s[i:i+1])) AS bg
                FROM norm WHERE length(s) >= 2
            ), counts AS (
                SELECT bg, count(*)::BIGINT AS n_bg FROM bg GROUP BY bg
            ), c1 AS (
                SELECT substr(bg, 1, 1) AS c1, sum(n_bg)::BIGINT AS n_c1
                FROM counts GROUP BY 1
            ), model AS (
                SELECT bg,
                       CAST(round(-ln((n_bg + 1.0) / (n_c1 + 28.0)) * 1000000)
                            AS BIGINT) AS cost
                FROM counts JOIN c1 ON substr(counts.bg, 1, 1) = c1.c1
            ), scored AS (
                SELECT b.doc_id,
                       count(*)::BIGINT AS n_bigrams,
                       sum(m.cost)::BIGINT AS cost_micro_total
                FROM bg b JOIN model m USING (bg)
                GROUP BY b.doc_id
            ), means AS (
                SELECT d.doc_id,
                       coalesce(s.n_bigrams, 0) AS n_bigrams,
                       round(coalesce(s.cost_micro_total, 0)::DOUBLE
                             / greatest(coalesce(s.n_bigrams, 0), 1) / 1e6,
                             6) AS mean_nats
                FROM documents d LEFT JOIN scored s USING (doc_id)
            ), cuts AS (
                SELECT round(quantile_cont(mean_nats, 1.0/3), 6) AS c1,
                       round(quantile_cont(mean_nats, 2.0/3), 6) AS c2
                FROM means WHERE n_bigrams > 0
            )
            SELECT m.doc_id, m.mean_nats,
                   CASE WHEN m.n_bigrams = 0 THEN 'tail'
                        WHEN m.mean_nats <= c.c1 THEN 'head'
                        WHEN m.mean_nats <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM means m CROSS JOIN cuts c
        """,
        # Exact replay of the greedy per-shard pack: shard = md5-hash of
        # the id mod 16, walk docs in id order, new sequence whenever
        # fill + tok would exceed 512.  The recursive CTE advances every
        # shard one row per iteration (rn join), i.e. the same O(rows)
        # integer fold packing.py runs in pandas.
        "pack_sequences": """
            WITH RECURSIVE docs AS (
                SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT % 16 AS INTEGER) AS shard,
                       doc_id,
                       len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))::BIGINT AS tok
                FROM documents
            ), ordered AS (
                SELECT shard, doc_id, tok,
                       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
                FROM docs
            ), pack AS (
                SELECT shard, doc_id, tok, rn,
                       0::BIGINT AS seq_id, tok AS fill
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.doc_id, d.tok, d.rn,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.seq_id
                            ELSE p.seq_id + 1 END,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.fill + d.tok
                            ELSE d.tok END
                FROM pack p
                JOIN ordered d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT shard, doc_id, tok, seq_id FROM pack
        """,
        # Same pack fold, then the materialization join: docs concatenated
        # in doc_id order per (shard, seq_id) with a blank-line separator.
        "packed_texts": """
            WITH RECURSIVE docs AS (
                SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT % 16 AS INTEGER) AS shard,
                       doc_id,
                       len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))::BIGINT AS tok
                FROM documents
            ), ordered AS (
                SELECT shard, doc_id, tok,
                       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
                FROM docs
            ), pack AS (
                SELECT shard, doc_id, tok, rn,
                       0::BIGINT AS seq_id, tok AS fill
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.doc_id, d.tok, d.rn,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.seq_id
                            ELSE p.seq_id + 1 END,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.fill + d.tok
                            ELSE d.tok END
                FROM pack p
                JOIN ordered d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT p.shard, p.seq_id,
                   count(*)::BIGINT AS n_docs,
                   sum(p.tok)::BIGINT AS fill_tokens,
                   string_agg(d.text, chr(10) || chr(10) ORDER BY p.doc_id) AS text
            FROM pack p JOIN documents d USING (doc_id)
            GROUP BY p.shard, p.seq_id
        """,
        "domain_stats": """
            SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain,
                   count(*) AS n_docs,
                   sum(length(text))::BIGINT AS total_chars
            FROM documents GROUP BY 1
        """,
        # String-shingle recomputation of the contamination counts (the
        # Spark side joins on 64-bit shingle hashes; collision probability
        # is the documented ~2^-64 bound).
        "benchmark_contamination": r"""
            WITH sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 8 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks)-7),
                            i -> array_to_string(list_slice(toks, i, i+7), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
            bench AS (SELECT doc_id AS bench_id, shingles FROM sh
                      WHERE doc_id < 20),
            pairs AS (
                SELECT c.doc_id, b.bench_id,
                       len(list_intersect(c.shingles, b.shingles))
                           AS shared_shingles
                FROM sh c CROSS JOIN bench b)
            SELECT doc_id, bench_id, shared_shingles::BIGINT AS shared_shingles
            FROM pairs WHERE shared_shingles >= 1
        """,
        # positional shingles on strings + window interval-merge — no
        # hashing anywhere on the oracle side.
        "contamination_spans": _CONTAM_SPANS_SQL_CORE + """
            SELECT doc_id, bench_id,
                   min(pos)::INTEGER AS span_start,
                   max(e)::INTEGER AS span_end,
                   count(*)::INTEGER AS n_shingles
            FROM g2
            GROUP BY doc_id, bench_id, grp
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS raw
                FROM e CROSS JOIN q),
            ranked AS (
                SELECT query_id, vec_id, raw,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY raw DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT query_id, vec_id, round(raw, 6) AS score, rank
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_pairs": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        """,
        # Exact oracle via guaranteed-recall construction: scaled copies
        # share every LSH bucket with their originals, so the bucketed
        # candidate set covers all true pairs and the exact-cosine verify
        # removes everything else.
        "embedding_near_dups_lsh": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            u AS (
                SELECT vec_id, v FROM e
                UNION ALL
                SELECT vec_id + 1000000, list_transform(v, x -> x * 1.001) FROM e),
            scored AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS raw
                FROM u a JOIN u b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(raw, 6) AS cosine
            FROM scored WHERE raw >= 0.99
        """,
        "resume_pending": """
            SELECT doc_id FROM documents WHERE doc_id % 2 <> 0
        """,
        "quarantine_summary": """
            SELECT CASE WHEN length(text) * 50 > 100000
                        THEN 'quarantined' ELSE 'ok' END AS status,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "shard_merge_roundtrip": """
            SELECT doc_id, length(text) AS merged_len FROM documents
        """,
        # 4 shards × one page each; sentinel '\n---Page-Break---\n' = 18 chars
        "shard_pagebreak_roundtrip": """
            SELECT doc_id, length(text) + 4 * 18 AS merged_len FROM documents
        """,
        "asof_latest_order": """
            WITH r AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate)
            SELECT e.event_id, r.o_orderkey
            FROM events e ASOF LEFT JOIN r
            ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        """,
        "event_sessions": """
            SELECT event_id,
                   CAST(sum(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT)
                                    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                                    > 3600
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        """,
        "example_samples": """
            SELECT event_type,
                   array_to_string(list_slice(list_sort(list(event_id)), 1, 5),
                                   ',') AS first_ids,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        # Exact oracle: the inverted-index pre-join is an exact algorithm,
        # so its output must equal the brute-force all-pairs set.
        "ngram_jaccard_pairs": _shingle_jaccard_oracle(k=4, threshold=0.8),
        # duplicated-substring spans: same 60-bit md5 gram hash as the
        # Spark side (Spark conv(substr(md5),16,10) ≡ DuckDB
        # ('0x'||substr(md5,1,15))::BIGINT), same gaps-and-islands merge
        "dup_ngram_spans": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM corpus
            ), pos AS (
                SELECT doc_id, i - 1 AS pos,
                       ('0x' || substr(md5(array_to_string(
                            list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT AS h
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 7)) AS i
                      FROM toks WHERE len(t) >= 8)
            ), dups AS (
                SELECT h FROM pos GROUP BY h HAVING count(*) >= 2
            ), hits AS (
                SELECT doc_id, pos FROM pos SEMI JOIN dups USING (h)
            ), islands AS (
                SELECT doc_id, pos,
                       CASE WHEN coalesce(pos > max(pos + 8) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), TRUE)
                            THEN 1 ELSE 0 END AS newi
                FROM hits
            ), labeled AS (
                SELECT doc_id, pos,
                       sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
                FROM islands
            )
            SELECT doc_id,
                   min(pos)::BIGINT AS span_start,
                   (max(pos) + 8)::BIGINT AS span_end,
                   (max(pos) + 8 - min(pos))::BIGINT AS n_tokens
            FROM labeled GROUP BY doc_id, island
        """,
        # mask rebuild: same span pipeline, then tokens outside every span
        # re-joined in order (case-preserving split — span indices come
        # from the lowered tokenization but \s+ positions are case-free)
        "masked_dup_spans": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM corpus
            ), pos AS (
                SELECT doc_id, i - 1 AS pos,
                       ('0x' || substr(md5(array_to_string(
                            list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT AS h
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 7)) AS i
                      FROM toks WHERE len(t) >= 8)
            ), dups AS (
                SELECT h FROM pos GROUP BY h HAVING count(*) >= 2
            ), hits AS (
                SELECT doc_id, pos FROM pos SEMI JOIN dups USING (h)
            ), islands AS (
                SELECT doc_id, pos,
                       CASE WHEN coalesce(pos > max(pos + 8) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), TRUE)
                            THEN 1 ELSE 0 END AS newi
                FROM hits
            ), labeled AS (
                SELECT doc_id, pos,
                       sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
                FROM islands
            ), spans AS (
                SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
                FROM labeled GROUP BY doc_id, island
            ), raw AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS t2
                FROM corpus
            ), tok_idx AS (
                SELECT doc_id, i - 1 AS idx, t2[i] AS tok
                FROM (SELECT doc_id, t2,
                             unnest(generate_series(1, len(t2))) AS i
                      FROM raw)
            ), masked AS (
                SELECT k.doc_id,
                       string_agg(k.tok, ' ' ORDER BY k.idx) AS text
                FROM tok_idx k
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans s
                    WHERE s.doc_id = k.doc_id
                      AND k.idx >= s.s AND k.idx < s.e)
                GROUP BY k.doc_id
            ), masked_counts AS (
                SELECT doc_id, sum(e - s)::BIGINT AS n FROM spans GROUP BY doc_id
            )
            SELECT c.doc_id,
                   CASE WHEN mc.n IS NULL THEN md5(c.text)
                        ELSE md5(coalesce(m.text, '')) END AS masked_md5,
                   coalesce(mc.n, 0)::BIGINT AS n_masked_tokens
            FROM corpus c
            LEFT JOIN masked m USING (doc_id)
            LEFT JOIN masked_counts mc USING (doc_id)
        """,
        # Recall oracle: LSH banding is probabilistic in general, but with
        # this (num_hashes=32, bands=8) config on the mutated-recrawl corpus
        # the candidate set provably-in-practice (deterministic signatures,
        # miss prob ≈ 3e-8 per true pair at J≈0.97) covers every true pair,
        # and the operator's exact-Jaccard verification removes all false
        # positives — so output == all pairs with true Jaccard ≥ 0.7.
        "minhash_pairs": _shingle_jaccard_oracle(k=3, threshold=0.7),
        "oph_minhash_pairs": _shingle_jaccard_oracle(k=3, threshold=0.7),
        # Same true-pair scan, endpoints tagged with the md5 hash_split
        # assignment; only cross-split pairs survive (the leakage audit).
        "split_leakage": _shingle_jaccard_oracle(
            k=3,
            threshold=0.7,
            final="""
            , splits AS (
                SELECT doc_id,
                       CASE WHEN u < 0.5 THEN 'train'
                            WHEN u < 0.75 THEN 'val'
                            ELSE 'test' END AS split
                FROM (
                    SELECT doc_id,
                           ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                           1, 15))::BIGINT
                           / 1152921504606846976.0 AS u
                    FROM corpus)
            )
            SELECT t.id_a, t.id_b,
                   sa.split AS split_a, sb.split AS split_b,
                   round(t.jaccard, 4) AS jaccard
            FROM truepairs t
            JOIN splits sa ON sa.doc_id = t.id_a
            JOIN splits sb ON sb.doc_id = t.id_b
            WHERE sa.split <> sb.split
            """,
        ),
        # The incremental (signature-store) path emits only pairs touching a
        # new id — old–old near-dups were yesterday's batch's output (some
        # exist: original docs that are near-dups of each other).
        "incremental_near_dups": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM truepairs
                WHERE id_a >= 1000000 OR id_b >= 1000000
            """,
        ),
        # Survivor oracle for the greedy near-dup removal (same recall
        # argument as minhash_pairs; exact verify removes false positives,
        # so dropped == distinct id_b of the true pair set).
        "dedup_near_survivors": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT doc_id FROM corpus
                WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM truepairs)
            """,
        ),
        # Transitive closure of the true pair set via recursive CTE — the
        # iterative label-propagation result is hash-checked end-to-end.
        "dedup_components": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT doc_id, component FROM (
                    WITH RECURSIVE und AS (
                        SELECT id_a AS a, id_b AS b FROM truepairs
                        UNION
                        SELECT id_b AS a, id_a AS b FROM truepairs),
                    reach(a, b) AS (
                        SELECT a, b FROM und
                        UNION
                        SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
                    comp AS (
                        SELECT a AS doc_id, least(a, min(b)) AS component
                        FROM reach GROUP BY a)
                    SELECT c.doc_id,
                           coalesce(comp.component, c.doc_id) AS component
                    FROM corpus c LEFT JOIN comp ON comp.doc_id = c.doc_id)
            """,
        ),
        # Exact oracle: banding recall is 1 by pigeonhole, and the md5-based
        # token hash is reproduced bit-for-bit in SQL.
        "simhash_pairs": _simhash_oracle(max_hamming=3),
        # Exact oracle: md5-based 60-bit fingerprints reproduced in SQL
        # (same normalization: trim spaces, lower, collapse \s runs).
        "doc_fingerprints": r"""
            WITH normed AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
                FROM documents),
            w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words
                  FROM normed),
            sh AS (
                SELECT doc_id, norm,
                       list_transform(
                           generate_series(1, greatest(len(words) - 3, 1)),
                           i -> ('0x' || substr(md5(array_to_string(
                                    list_slice(words, i, i + 3), ' ')), 1, 15)
                                )::BIGINT) AS shs
                FROM w)
            SELECT doc_id,
                   ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fingerprint,
                   list_aggregate(shs, 'min') AS min_shingle_hash
            FROM sh
        """,
        # Construction oracle: the page builder is deterministic, so the
        # classifier's recovered main content is a pure SQL function of the
        # documents table (heading + non-blank lines; boilerplate and ad
        # blocks must vanish by tag prior / link density).
        "html_boilerplate_extract": """
            WITH lined AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> regexp_matches(x, '[^ \\t\\r]')) AS lines
                FROM documents),
            built AS (
                SELECT doc_id, len(lines) AS n_paragraphs,
                       'Document ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                       CASE WHEN len(lines) = 0 THEN ''
                            ELSE array_to_string(lines, chr(10)) || chr(10)
                       END AS expected
                FROM lined)
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   sha256(expected) AS text_sha,
                   length(expected)::BIGINT AS n_chars,
                   1::BIGINT AS n_headings,
                   n_paragraphs::BIGINT AS n_paragraphs
            FROM built
        """,
        # Readability mode over the same constructed page: when any
        # non-blank line has trim-length >= 25 the body candidate wins
        # and ads/nav are removed -> identical content to the density
        # mode; otherwise nothing scores and the doc extracts EMPTY.
        "readability_extract": """
            WITH lined AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> regexp_matches(x, '[^ \t\r]')) AS lines
                FROM documents),
            flags AS (
                SELECT doc_id, lines,
                       len(list_filter(lines,
                           x -> length(trim(x, ' ' || chr(9) || chr(13)
                                             || chr(10))) >= 25)) > 0
                           AS has_prose
                FROM lined),
            built AS (
                SELECT doc_id,
                       CASE WHEN has_prose THEN len(lines) ELSE 0 END
                           AS n_paragraphs,
                       CASE WHEN has_prose THEN 1 ELSE 0 END AS n_headings,
                       CASE WHEN NOT has_prose THEN ''
                            ELSE 'Document ' || CAST(doc_id AS VARCHAR)
                                 || chr(10) ||
                                 CASE WHEN len(lines) = 0 THEN ''
                                      ELSE array_to_string(lines, chr(10))
                                           || chr(10) END
                       END AS expected
                FROM flags)
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   sha256(expected) AS text_sha,
                   length(expected)::BIGINT AS n_chars,
                   n_headings::BIGINT AS n_headings,
                   n_paragraphs::BIGINT AS n_paragraphs
            FROM built
        """,
        "image_caption_pairs": """
            WITH d AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, chr(10)),
                           x -> regexp_matches(x, '[^ \\t\\r]'))) AS n
                FROM documents),
            imgs AS (
                SELECT doc_id, 0::BIGINT AS seq, '/logo.png' AS src,
                       'site logo' AS caption, TRUE AS boilerplate,
                       'http://crawl.invalid/logo.png' AS img_url
                FROM d
                UNION ALL
                SELECT doc_id, (1 + k)::BIGINT,
                       '/img/' || CAST(doc_id AS VARCHAR) || '/'
                           || CAST(k AS VARCHAR) || '.jpg',
                       'Figure ' || CAST(k AS VARCHAR) || ' of document '
                           || CAST(doc_id AS VARCHAR),
                       FALSE,
                       'http://crawl.invalid/img/'
                           || CAST(doc_id AS VARCHAR) || '/'
                           || CAST(k AS VARCHAR) || '.jpg'
                FROM (SELECT doc_id,
                             unnest(generate_series(0, n // 3 - 1)) AS k
                      FROM d)
                UNION ALL
                SELECT doc_id, (1 + n // 3)::BIGINT,
                       '//cdn.crawl.invalid/badge.png', '', TRUE,
                       'http://cdn.crawl.invalid/badge.png'
                FROM d)
            SELECT 'http://crawl.invalid/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                   seq, src, caption, boilerplate, img_url
            FROM imgs
        """,
        # Deterministic-corpus golden: expected features per media_id
        # computed once by the same pure stdlib codecs, inlined as VALUES.
        "media_features": _media_features_oracle(),
        # Reference-derived goldens: byte-identical extracted text per url.
        **_extraction_oracles(),
        # Approximate-ANN oracles: same hyperplanes/centroids inlined as
        # literals, bucket/cell assignment and ranking recomputed in SQL.
        "ann_topk_lsh": _lsh_topk_oracle(),
        "project_embeddings": _project_embeddings_oracle(),
        **(
            {"ann_topk_ivf": o} if (o := _ivf_topk_oracle()) is not None else {}
        ),
        **(
            {"kmeans_profile": o}
            if (o := _kmeans_profile_oracle()) is not None
            else {}
        ),
        **(
            {"semantic_dedup": o}
            if (o := _semantic_dedup_oracle()) is not None
            else {}
        ),
        "encoding_signals": _encoding_signals_oracle(),
        "ocr_artifacts": _ocr_artifacts_oracle(),
        # Native percent_rank window — the per-(lang,bucket) rank +
        # cross-bucket offset reconstruction must equal it exactly.
        "calibrated_scores": """
            WITH feats AS (
                SELECT doc_id, lang,
                       round(length(regexp_replace(text,
                               '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                             / greatest(length(text), 1), 6) AS score
                FROM documents)
            SELECT doc_id, lang, score,
                   round(percent_rank() OVER (PARTITION BY lang
                         ORDER BY score), 6)::DOUBLE AS pct_rank
            FROM feats
        """,
        # Artetxe-Schwenk margin: micro-unit cosine ints, exact top-k
        # neighborhood sums, one double division — mirrors
        # similarity.bitext_margin_mine term for term.
        "bitext_mining": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            s AS (SELECT vec_id AS src_id, v FROM e WHERE vec_id % 2 = 0),
            t AS (SELECT vec_id AS tgt_id, v FROM e WHERE vec_id % 2 = 1),
            scored AS (
                SELECT s.src_id, t.tgt_id,
                       round({_COSINE.format(a='s.v', b='t.v')} * 1000000,
                             0)::BIGINT AS c6
                FROM s CROSS JOIN t),
            nx AS (
                SELECT src_id, sum(c6) AS sx, count(*) AS cx FROM (
                    SELECT src_id, c6,
                           row_number() OVER (PARTITION BY src_id
                               ORDER BY c6 DESC, tgt_id) AS r
                    FROM scored) WHERE r <= 4 GROUP BY src_id),
            ny AS (
                SELECT tgt_id, sum(c6) AS sy, count(*) AS cy FROM (
                    SELECT tgt_id, c6,
                           row_number() OVER (PARTITION BY tgt_id
                               ORDER BY c6 DESC, src_id) AS r
                    FROM scored) WHERE r <= 4 GROUP BY tgt_id),
            m AS (
                SELECT sc.src_id, sc.tgt_id, sc.c6,
                       round(sc.c6 * 2.0 * nx.cx * ny.cy
                             / (nx.sx * ny.cy + ny.sy * nx.cx), 6) AS margin
                FROM scored sc
                JOIN nx ON sc.src_id = nx.src_id
                JOIN ny ON sc.tgt_id = ny.tgt_id
                WHERE round(sc.c6 * 2.0 * nx.cx * ny.cy
                            / (nx.sx * ny.cy + ny.sy * nx.cx), 6) >= 1.02)
            SELECT src_id, tgt_id, (c6 / 1000000)::DOUBLE AS cosine,
                   margin::DOUBLE AS margin
            FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                      ORDER BY margin DESC, tgt_id) AS rk FROM m)
            WHERE rk = 1
        """,
        # Salted md5-60 shard hash + per-shard rank, one window.
        "training_shards": """
            WITH h AS (
                SELECT doc_id,
                       ('0x' || substr(md5('epoch0:' ||
                           CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
                FROM documents)
            SELECT doc_id,
                   (hv % 16)::INTEGER AS shard,
                   row_number() OVER (PARTITION BY hv % 16
                                      ORDER BY hv, doc_id)::INTEGER AS pos
            FROM h
        """,
        # Rendezvous hashing: argmax over 8 per-shard hashes; QUALIFY
        # (h DESC, s DESC) matches array_max's lexicographic struct
        # order (max hash, ties to max s).
        "hrw_shards": """
            WITH c AS (
                SELECT doc_id, s,
                       ('0x' || substr(md5(doc_id || ':hrw:' || s), 1, 15))
                           ::BIGINT AS h
                FROM documents,
                     (SELECT unnest(generate_series(0, 7)) AS s)
            )
            SELECT doc_id, s::INTEGER AS shard, h::BIGINT AS shard_weight
            FROM c
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY h DESC, s DESC) = 1
        """,
        **(
            {"bpe_merges": o}
            if (o := _bpe_merges_oracle()) is not None
            else {}
        ),
        "extraction_eval": _extraction_eval_oracle(),
        **(
            {"bpe_encode": o}
            if (o := _bpe_encode_oracle()) is not None
            else {}
        ),
        **(
            {"wordpiece_symbols": o}
            if (o := _wordpiece_symbols_oracle()) is not None
            else {}
        ),
        **(
            {"bpe_fertility": o}
            if (o := _bpe_fertility_oracle()) is not None
            else {}
        ),
        # JSON-LD: replay the synthetic block layout directly (Article
        # always block 0; BreadcrumbList next when doc_id%5=0; the
        # malformed block takes the following slot when doc_id%7=3) and
        # parse with DuckDB's JSON parser behind a json_valid guard —
        # its json_extract RAISES on malformed input where Spark's
        # get_json_object returns NULL.
        "jsonld_extract": """
            WITH docs AS (
                SELECT doc_id,
                       'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       (doc_id % 5 = 0) AS has_crumbs,
                       (doc_id % 7 = 3) AS has_bad
                FROM documents
            ), blocks AS (
                SELECT url, 0 AS block_id,
                       '{"@type":"Article","name":"Document '
                           || CAST(doc_id AS VARCHAR)
                           || '","datePublished":"2025-01-'
                           || lpad(CAST((doc_id % 28) + 1 AS VARCHAR),
                                   2, '0')
                           || '"}' AS block
                FROM docs
                UNION ALL
                SELECT url, 1,
                       '{"@type":"BreadcrumbList","name":"crumbs '
                           || CAST(doc_id AS VARCHAR) || '"}'
                FROM docs WHERE has_crumbs
                UNION ALL
                SELECT url, CASE WHEN has_crumbs THEN 2 ELSE 1 END,
                       '{oops not json'
                FROM docs WHERE has_bad
            )
            SELECT url, block_id::INT AS block_id,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$."@type"') END
                       AS ld_type,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$.name') END
                       AS ld_name,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$.datePublished') END
                       AS ld_date
            FROM blocks
        """,
        # Templates: same skeleton regexes (hex-run pass before digit
        # pass, global flag explicit in DuckDB), same share window.
        "url_templates": r"""
            WITH urls AS (
                SELECT CASE
                    WHEN doc_id % 4 = 0 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/cal/2024/'
                        || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
                        || '/' || CAST(doc_id AS VARCHAR)
                    WHEN doc_id % 4 = 1 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/article/' || CAST(doc_id AS VARCHAR)
                        || '-page'
                    WHEN doc_id % 4 = 2 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/session/'
                        || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                        || '/view?sid=' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR)
                         || '.com/about' END AS url
                FROM documents
            ), slim AS (
                SELECT regexp_extract(lower(url),
                           '^[a-z][a-z0-9+.\-]*://([^/:?#]*)', 1)
                           AS host,
                       regexp_replace(regexp_replace(
                           regexp_extract(url,
                               '^[a-z][a-z0-9+.\-]*://[^/]*(/[^?#]*)?', 1),
                           '[0-9a-f]{8,}', '{H}', 'g'),
                           '[0-9]+', '{N}', 'g') AS template
                FROM urls
            ), named AS (
                SELECT CASE WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                                 <> ''
                            THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                            ELSE host END AS domain,
                       CASE WHEN template = '' THEN '/' ELSE template END
                           AS template
                FROM slim
            ), counts AS (
                SELECT domain, template, count(*)::BIGINT AS n_urls
                FROM named GROUP BY domain, template
            )
            SELECT domain, template, n_urls,
                   round(n_urls / (sum(n_urls) OVER (PARTITION BY domain))
                         ::DOUBLE, 6) AS share
            FROM counts WHERE n_urls >= 2
        """,
        "license_signals": _license_signals_oracle(),
        # Flesch: same counts, same division order, round 4.
        "flesch_scores": """
            WITH base AS (
                SELECT doc_id, lower(coalesce(text, '')) AS lt
                FROM documents
            ), c AS (
                SELECT doc_id,
                       len(regexp_extract_all(lt, '[.!?]+')) AS n_sentences,
                       len(regexp_extract_all(lt, '[a-zà-öø-ÿ]+'))
                           AS n_words,
                       len(regexp_extract_all(lt, '[aeiouy]+')) AS vg
                FROM base
            )
            SELECT doc_id,
                   n_sentences::INT AS n_sentences,
                   n_words::INT AS n_words,
                   greatest(vg, n_words)::INT AS n_syllables,
                   CASE WHEN n_sentences > 0 AND n_words > 0 THEN
                       round(206.835::DOUBLE
                             - 1.015::DOUBLE * (n_words / n_sentences)
                             - 84.6::DOUBLE
                               * (greatest(vg, n_words) / n_words), 4)
                   END AS flesch
            FROM c
        """,
        # Outliers: component explode via generate_series, same naive
        # moments, z compared on the rounded value.
        "embedding_outliers": """
            WITH comp AS (
                SELECT vec_id, label, u.j AS j, u.val AS val
                FROM (SELECT vec_id, label,
                             embedding::DOUBLE[] AS v FROM embeddings),
                     UNNEST(list_transform(generate_series(1, len(v)),
                            j -> {'j': j, 'val': v[j]})) AS t(u)
            ), cent AS (
                SELECT label, j, avg(val) AS m FROM comp GROUP BY label, j
            ), d AS (
                SELECT c.vec_id, c.label,
                       sqrt(sum((c.val - ct.m) * (c.val - ct.m))) AS dist
                FROM comp c JOIN cent ct ON c.label = ct.label AND c.j = ct.j
                GROUP BY c.vec_id, c.label
            ), base AS (
                -- every input vector keeps its verdict row: NULL/empty
                -- embeddings (no comp rows) surface with dist NULL and
                -- is_outlier = true, mirroring the Spark operator
                SELECT e.vec_id, e.label, d.dist
                FROM embeddings e
                LEFT JOIN d ON e.vec_id = d.vec_id AND e.label = d.label
            ), stats AS (
                SELECT label, avg(dist) AS mu, avg(dist * dist) AS m2
                FROM base GROUP BY label
            )
            SELECT b.vec_id, b.label,
                   round(b.dist, 6) AS dist,
                   round(CASE WHEN sqrt(s.m2 - s.mu * s.mu) > 0
                              THEN (b.dist - s.mu)
                                   / sqrt(s.m2 - s.mu * s.mu) END, 4) AS z,
                   CASE WHEN b.dist IS NULL THEN TRUE
                        ELSE coalesce(round(CASE WHEN sqrt(s.m2 - s.mu * s.mu) > 0
                              THEN (b.dist - s.mu)
                                   / sqrt(s.m2 - s.mu * s.mu) END, 4)
                            > 2.0::DOUBLE, FALSE) END AS is_outlier
            FROM base b LEFT JOIN stats s ON b.label = s.label
        """,
        # Temperature sampling: n^alpha as exp(a ln n) quantized to
        # integer micro-units (the 1-ulp libm difference dies in the
        # floor), integer normalizing sum, one division at the end.
        "temperature_mixture": """
            WITH sizes AS (
                SELECT lang, sum(n_chars)::BIGINT AS n_units
                FROM documents GROUP BY lang
                HAVING sum(n_chars) > 0
            ), wtd AS (
                SELECT lang, n_units,
                       floor(exp(0.5::DOUBLE * ln(n_units))
                             * 1000000.0::DOUBLE + 0.5)::BIGINT AS w
                FROM sizes
            ), tot AS (
                SELECT sum(w)::BIGINT AS tw, sum(n_units)::BIGINT AS tn
                FROM wtd
            )
            SELECT lang, n_units,
                   round(n_units / tn, 6) AS share_raw,
                   round(w / tw, 6) AS share_temp,
                   floor((w / tw) * 10000000)::BIGINT AS target_units,
                   round(floor((w / tw) * 10000000) / n_units, 4) AS epochs
            FROM wtd CROSS JOIN tot
        """,
        # Code signals: same four families under RE2 (?m); thresholds
        # compare the same rounded values.
        "code_signals": r"""
            WITH docs AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 3 THEN
                           'def handler_' || CAST(doc_id AS VARCHAR)
                           || '(x):' || chr(10) || '    return x + '
                           || CAST(doc_id AS VARCHAR) || ';' || chr(10)
                           || chr(10) || 'class Page'
                           || CAST(doc_id AS VARCHAR) || ':' || chr(10)
                           || '    import os' || chr(10)
                           || '    var cache = {};' || chr(10)
                           || '    const LIMIT = '
                           || CAST(doc_id AS VARCHAR) || ';' || chr(10)
                       ELSE text END AS text
                FROM documents
            ), base AS (
                SELECT doc_id, coalesce(text, '') AS t FROM docs
            ), feats AS (
                SELECT doc_id,
                    greatest(length(t), 1)::DOUBLE AS n_chars,
                    greatest(CASE WHEN t = '' THEN 0
                             ELSE len(regexp_extract_all(t, '\n')) + 1 END,
                             1)::DOUBLE AS n_lines,
                    len(regexp_extract_all(t, '[{}();=<>]')) AS n_punct,
                    len(regexp_extract_all(t, '(?m)^[ \t]{2,}\S'))
                        AS n_indent,
                    len(regexp_extract_all(t, '(?m)[;{}][ \t\r]*$'))
                        AS n_termin,
                    (CASE WHEN regexp_matches(t, '\bdef\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\breturn\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bimport\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bfunction\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bvar\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bconst\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bclass\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bvoid\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\binclude\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bpublic\b') THEN 1 ELSE 0 END
                    )::INT AS keyword_hits
                FROM base
            ), sig AS (
                SELECT doc_id,
                       round(n_punct / n_chars, 6) AS punct_density,
                       round(n_indent / n_lines, 6) AS indent_ratio,
                       round(n_termin / n_lines, 6) AS terminator_ratio,
                       keyword_hits
                FROM feats
            )
            SELECT doc_id, punct_density, indent_ratio, terminator_ratio,
                   keyword_hits,
                   ((punct_density >= 0.02 AND indent_ratio >= 0.2)
                    OR (keyword_hits >= 3 AND punct_density >= 0.01))
                       AS is_code
            FROM sig
        """,
        # Tiers: gopher algebra as a CTE + the keep-lowest exact-dup
        # window; thresholds compare the same rounded signals.
        "corpus_tiers": """
            WITH g AS (""" + _GOPHER_ORACLE + """),
            dup AS (
                SELECT doc_id,
                       doc_id <> min(doc_id) OVER (
                           PARTITION BY md5(coalesce(text, ''))
                       ) AS dup_loser
                FROM documents
            )
            SELECT g.doc_id, d.dup_loser, g.keep,
                   CASE WHEN d.dup_loser OR g.n_words < 25
                             OR g.alpha_word_ratio <= 0.8
                             OR g.symbol_ratio >= 0.1 THEN 'reject'
                        WHEN g.n_words >= 70
                             AND g.mean_word_len BETWEEN 3.0 AND 10.0
                             THEN 'head'
                        ELSE 'mid' END AS tier
            FROM g JOIN dup d ON g.doc_id = d.doc_id
        """,
        # Mirrors: same registrable-domain extraction (last two host
        # labels), same md5-of-coalesced-text key, sorted distinct CSV.
        "mirror_domains": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       md5(coalesce(text, '')) AS content_md5
                FROM documents
                UNION ALL
                SELECT 'mirror-site' || CAST(doc_id % 13 AS VARCHAR)
                           || '.org' AS domain,
                       md5(coalesce(text, '')) AS content_md5
                FROM documents WHERE doc_id % 10 = 0
            )
            SELECT content_md5,
                   count(*)::BIGINT AS n_pages,
                   count(DISTINCT domain)::INT AS n_domains,
                   array_to_string(list_sort(list_distinct(list(domain))),
                                   ',') AS domains_csv
            FROM pages GROUP BY content_md5
            HAVING count(DISTINCT domain) >= 2
        """,
        # C4: same line predicates via list_filter (RE2 both sides),
        # same page rules; cleaned bytes compared by md5.
        "c4_page_filter": r"""
            WITH lined AS (
                SELECT doc_id,
                       coalesce(text, '') AS t,
                       string_split(coalesce(text, ''), chr(10)) AS lines
                FROM documents
            ), kept AS (
                SELECT doc_id, t, len(lines) AS n_lines,
                       list_filter(lines, x ->
                           regexp_matches(x, '[.!?"][ \t\r]*$')
                           AND len(regexp_extract_all(x, '\S+')) >= 3
                           AND NOT contains(lower(x), 'javascript')
                       ) AS keptl
                FROM lined
            ), c AS (
                SELECT doc_id, n_lines, len(keptl) AS n_kept,
                       coalesce(array_to_string(keptl, chr(10)), '')
                           AS cleaned, t
                FROM kept
            )
            SELECT doc_id,
                   n_lines::INT AS n_lines,
                   n_kept::INT AS n_kept,
                   len(regexp_extract_all(cleaned, '[.!?]'))::INT
                       AS n_sentences,
                   (len(regexp_extract_all(cleaned, '[.!?]')) >= 5
                    AND NOT contains(lower(t), 'lorem ipsum')
                    AND NOT contains(t, '{')) AS page_kept,
                   md5(cleaned) AS cleaned_md5
            FROM c
        """,
        # HLL: same md5-60 bucket/rank split, integer harmonic sum in
        # units of 2^-53 (exact, order-independent), same linear-counting
        # branch; alpha mirrored as the same expression shape.
        "hll_domain_distinct": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       'https://site' || CAST(doc_id % 13 AS VARCHAR)
                           || '.com/doc/' || CAST(doc_id AS VARCHAR) AS url
                FROM documents
            ), hashed AS (
                SELECT domain,
                       ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
                FROM pages
            ), regs AS (
                SELECT domain, h >> 52 AS bucket,
                       max(CASE WHEN (h & 4503599627370495) = 0 THEN 53
                                ELSE 52 - length(bin(h & 4503599627370495))
                                     + 1 END) AS max_rho
                FROM hashed GROUP BY domain, bucket
            ), agg AS (
                SELECT domain,
                       sum((1::BIGINT << (53 - max_rho)))::BIGINT
                           AS present_sum,
                       count(*)::BIGINT AS n_present
                FROM regs GROUP BY domain
            ), raws AS (
                SELECT domain,
                       (0.7213::DOUBLE / (1 + 1.079::DOUBLE / 256)) * 256
                           * 256 * 9007199254740992::DOUBLE
                           / (present_sum
                              + (256 - n_present) * 9007199254740992)
                           AS raw,
                       256 - n_present AS v
                FROM agg
            ), ests AS (
                SELECT domain,
                       round(CASE WHEN raw <= 2.5::DOUBLE * 256 AND v > 0
                                  THEN 256 * ln(256 / v::DOUBLE)
                                  ELSE raw END, 4) AS est_distinct
                FROM raws
            ), exact AS (
                SELECT domain, count(DISTINCT url)::BIGINT AS exact_distinct
                FROM pages GROUP BY domain
            )
            SELECT e.domain, x.exact_distinct, e.est_distinct,
                   round(abs(e.est_distinct - x.exact_distinct)
                         / x.exact_distinct, 4) AS rel_error
            FROM ests e JOIN exact x ON e.domain = x.domain
        """,
        # Histogram sketch: same bin clamp, cumulative walk, and linear
        # interpolation (width 100.0 = (5000-0)/50, exact in double).
        "histogram_quantiles": """
            WITH vals AS (
                SELECT n_chars::DOUBLE AS x FROM documents
                WHERE n_chars IS NOT NULL
            ), bins AS (
                SELECT least(greatest(floor((x - 0.0) / 100.0), 0),
                             49)::BIGINT AS bin,
                       count(*)::BIGINT AS c
                FROM vals GROUP BY 1
            ), cum AS (
                SELECT bin, c,
                       sum(c) OVER (ORDER BY bin) AS cum,
                       coalesce(sum(c) OVER (ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cum_before
                FROM bins
            ), tot AS (SELECT sum(c)::BIGINT AS n FROM bins),
            qs AS (
                SELECT unnest([0.25, 0.5, 0.9, 0.99]::DOUBLE[]) AS q
            ), hit AS (
                SELECT q.q, t.n, c.bin, c.c, c.cum_before,
                       row_number() OVER (PARTITION BY q.q
                                          ORDER BY c.bin) AS rn
                FROM qs q CROSS JOIN tot t
                JOIN cum c ON c.cum >= q.q * t.n
            )
            SELECT q,
                   round(0.0 + (bin + (q * n - cum_before) / c) * 100.0, 6)
                       AS estimate
            FROM hit WHERE rn = 1
        """,
        # Bloom: same md5-60 bit arithmetic; all-6-bits-set membership.
        "bloom_membership": """
            WITH urls AS (
                SELECT doc_id,
                       'https://crawl.invalid/doc/' || doc_id AS url
                FROM documents
            ), ks AS (
                SELECT unnest(generate_series(0, 5)) AS i
            ), bits AS (
                SELECT DISTINCT
                       ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                           || url), 1, 15))::BIGINT % 8192 AS bit
                FROM urls CROSS JOIN ks
                WHERE doc_id % 3 = 0
            ), probes AS (
                SELECT u.doc_id,
                       ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                           || u.url), 1, 15))::BIGINT % 8192 AS bit
                FROM urls u CROSS JOIN ks
            ), hits AS (
                SELECT doc_id,
                       (sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                        = 6) AS might_contain
                FROM probes p LEFT JOIN bits b ON b.bit = p.bit
                GROUP BY doc_id
            )
            SELECT doc_id, might_contain,
                   (doc_id % 3 = 0) AS actually_in
            FROM hits
        """,
        # Wilson bound: identical expression shape (z² as the double
        # product 1.96::DOUBLE * 1.96::DOUBLE, same nesting), rounded 6 dp.
        "domain_quality_rank": """
            WITH d AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       (n_chars >= 400) AS keep
                FROM documents
            ), agg AS (
                SELECT domain, count(*)::BIGINT AS n_docs,
                       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT
                           AS n_quality
                FROM d GROUP BY domain
            )
            SELECT domain, n_docs, n_quality,
                   round(n_quality / n_docs::DOUBLE, 6) AS quality_rate,
                   round(((n_quality / n_docs::DOUBLE)
                          + (1.96::DOUBLE * 1.96::DOUBLE)
                              / (2 * n_docs::DOUBLE)
                          - 1.96::DOUBLE * sqrt((
                                (n_quality / n_docs::DOUBLE)
                                * (1 - (n_quality / n_docs::DOUBLE))
                                + (1.96::DOUBLE * 1.96::DOUBLE)
                                    / (4 * n_docs::DOUBLE)
                            ) / n_docs::DOUBLE))
                         / (1 + (1.96::DOUBLE * 1.96::DOUBLE)
                                / n_docs::DOUBLE), 6) AS wilson_lb
            FROM agg
        """,
        # CMS: same md5 bucket arithmetic, counters, and min-over-rows;
        # the top-30 cut orders by (count desc, token asc) in both engines.
        "cms_heavy_hitters": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                              '[a-zà-öø-ÿ]+')) AS tok
                FROM documents
            ), truec AS (
                SELECT tok, count(*)::BIGINT AS true_n FROM toks GROUP BY tok
            ), top AS (
                SELECT tok, true_n FROM truec
                ORDER BY true_n DESC, tok LIMIT 30
            ), rows_ AS (
                SELECT unnest(generate_series(0, 3)) AS row
            ), counters AS (
                SELECT r.row,
                       ('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                           || t.tok), 1, 15))::BIGINT % 1024 AS bucket,
                       count(*)::BIGINT AS c
                FROM toks t CROSS JOIN rows_ r
                GROUP BY 1, 2
            ), probes AS (
                SELECT top.tok, top.true_n, r.row,
                       ('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                           || top.tok), 1, 15))::BIGINT % 1024 AS bucket
                FROM top CROSS JOIN rows_ r
            )
            SELECT p.tok, p.true_n,
                   min(coalesce(c.c, 0))::BIGINT AS cms_est
            FROM probes p
            LEFT JOIN counters c ON c.row = p.row AND c.bucket = p.bucket
            GROUP BY p.tok, p.true_n
        """,
        # Intra-doc line collapse: the same index-lambda filter (keep line
        # i iff blank or first occurrence) replayed with DuckDB lambdas.
        "collapse_lines": """
            WITH pages AS (
                SELECT doc_id,
                       'NAV MENU' || chr(10) || coalesce(text, '')
                       || chr(10) || 'NAV MENU' || chr(10)
                       || split_part(coalesce(text, ''), chr(10), 1) AS t
                FROM documents
            ), arr AS (
                SELECT doc_id, string_split(t, chr(10)) AS ls FROM pages
            ), kept AS (
                SELECT doc_id, ls,
                       list_filter(ls, (x, i) -> x = ''
                                   OR list_position(ls, x) = i) AS ks
                FROM arr
            )
            SELECT doc_id,
                   array_to_string(ks, chr(10)) AS text_clean,
                   len(ls)::INT AS n_lines,
                   (len(ls) - len(ks))::INT AS n_dropped
            FROM kept
        """,
        # Blocklist: identical separator-doubling normalize + literal
        # replace arithmetic in both engines.
        "term_blocklist": """
            WITH pages AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 2 THEN coalesce(text, '')
                            || ' Click here to subscribe. Casino winner!'
                            || ' Click here now.'
                       ELSE text END AS text
                FROM documents
            ), low AS (
                SELECT doc_id, lower(coalesce(text, '')) AS lt FROM pages
            ), norm AS (
                SELECT doc_id, lt,
                       ' ' || regexp_replace(lt, '[^a-zà-öø-ÿ]+', '  ', 'g')
                       || ' ' AS nm
                FROM low
            ), hits AS (
                SELECT doc_id,
                       ((length(nm) - length(replace(nm, ' click  here ', '')))
                            // length(' click  here ')
                        + (length(nm) - length(replace(nm, ' subscribe ', '')))
                            // length(' subscribe ')
                        + (length(nm) - length(replace(nm, ' casino ', '')))
                            // length(' casino ')
                        + (length(nm) - length(replace(nm, ' winner ', '')))
                            // length(' winner ')
                        + (length(nm) - length(replace(nm, ' buy  now ', '')))
                            // length(' buy  now ')
                        + (length(nm) - length(replace(nm,
                              ' lorem  ipsum ', ''))) // length(' lorem  ipsum ')
                       )::INT AS n_blocklist_hits,
                       len(regexp_extract_all(lt, '[a-zà-öø-ÿ]+'))
                           AS n_words
                FROM norm
            )
            SELECT doc_id, n_blocklist_hits,
                   round(n_blocklist_hits
                         / greatest(n_words, 1)::DOUBLE, 6) AS blocked_ratio,
                   (n_blocklist_hits >= 1) AS is_blocked
            FROM hits
        """,
        # Mixture: T* = min(available/frac), rate = frac*T*/available,
        # membership by the md5 unit hash; target fractions cast ::DOUBLE
        # immediately (a bare VALUES 0.4 is DECIMAL in DuckDB and would
        # poison the arithmetic/formatting).
        "corpus_mixture": """
            WITH targets AS (
                SELECT source, target_frac::DOUBLE AS target_frac
                FROM (VALUES ('src0', 0.4), ('src1', 0.3),
                             ('src2', 0.2), ('src3', 0.1))
                     t(source, target_frac)
            ), avail AS (
                SELECT source, sum(n_chars)::BIGINT AS available
                FROM documents GROUP BY source
            ), plan AS (
                SELECT t.source, t.target_frac,
                       coalesce(a.available, 0)::BIGINT AS available
                FROM targets t LEFT JOIN avail a ON a.source = t.source
            ), tstar AS (
                SELECT min(available / target_frac) AS t FROM plan
            ), rates AS (
                SELECT source, target_frac, available,
                       CASE WHEN available > 0
                            THEN target_frac * tstar.t / available
                            ELSE 0.0 END AS rate
                FROM plan, tstar
            ), kept AS (
                SELECT d.source, count(*)::BIGINT AS n_docs_kept,
                       sum(d.n_chars)::BIGINT AS chars_kept
                FROM documents d JOIN rates r ON r.source = d.source
                WHERE ('0x' || substr(md5('mixture:'
                          || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                      / 1152921504606846976.0 < r.rate
                GROUP BY d.source
            )
            SELECT r.source, round(r.target_frac, 6) AS target_frac,
                   r.available, round(r.rate, 6) AS rate,
                   coalesce(k.n_docs_kept, 0)::BIGINT AS n_docs_kept,
                   coalesce(k.chars_kept, 0)::BIGINT AS chars_kept
            FROM rates r LEFT JOIN kept k ON k.source = r.source
        """,
        # Soft-404: phrase membership via contains() on the lowered body,
        # word tokens via the shared token class, URL hint via the same
        # RE2-safe pattern; every-11th doc rewritten as in the Spark query.
        "soft404_detect": """
            WITH pages AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 11 = 3 THEN
                           '404 Page Not Found - The requested URL /doc/'
                           || doc_id || ' was not found on this server.'
                       ELSE text END AS text,
                       CASE WHEN doc_id % 11 = 3 THEN
                           'https://crawl.invalid/' || doc_id || '/404'
                       ELSE 'https://crawl.invalid/doc/' || doc_id
                       END AS url
                FROM documents
            ), low AS (
                SELECT doc_id, url,
                       lower(coalesce(text, '')) AS t
                FROM pages
            ), sig AS (
                SELECT doc_id,
                       (contains(t, 'page not found')::INT
                        + contains(t, '404 not found')::INT
                        + contains(t, 'error 404')::INT
                        + contains(t, 'not found on this server')::INT
                        + contains(t, 'access denied')::INT
                        + contains(t, 'no longer available')::INT
                        + contains(t, 'temporarily unavailable')::INT
                        + contains(t, 'this page does not exist')::INT
                       )::INT AS n_error_phrases,
                       len(regexp_extract_all(t, '[a-zà-öø-ÿ]+'))::INT
                           AS n_word_tokens,
                       coalesce(regexp_matches(lower(url),
                           '(404|not-found|error)([/.?]|$)'), false)
                           AS url_error_hint
                FROM low
            )
            SELECT doc_id, n_error_phrases, n_word_tokens, url_error_hint,
                   (n_error_phrases >= 1
                    AND (n_word_tokens <= 40 OR url_error_hint))
                       AS is_soft404
            FROM sig
        """,
        # Containment over documents ∪ half-excerpts: shingle semantics as
        # in _shingle_jaccard_oracle; candidates via a shared-shingle
        # inverted index (sound: threshold > 0 needs shared ≥ 1); filter on
        # ROUNDED c to mirror the Spark boundary exactly.
        "containment_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       array_to_string(list_slice(
                           regexp_split_to_array(trim(text), '\\s+'), 1,
                           (len(regexp_split_to_array(trim(text), '\\s+'))
                            + 1) // 2), ' ')
                FROM documents
            ),
            sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 5 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks) - 4),
                            i -> array_to_string(
                                     list_slice(toks, i, i + 4), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ),
            sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
            inv AS (SELECT doc_id, unnest(shingles) AS s FROM sized),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM inv a JOIN inv b
                  ON a.s = b.s AND a.doc_id < b.doc_id
            ),
            scored AS (
                SELECT c.id_a, c.id_b,
                       len(list_intersect(a.shingles, b.shingles))::BIGINT
                           AS shared,
                       a.n AS n_a, b.n AS n_b
                FROM cand c
                JOIN sized a ON a.doc_id = c.id_a
                JOIN sized b ON b.doc_id = c.id_b
            )
            SELECT id_a, id_b, shared,
                   round(shared::DOUBLE / n_a, 4) AS c_a,
                   round(shared::DOUBLE / n_b, 4) AS c_b
            FROM scored
            WHERE greatest(round(shared::DOUBLE / n_a, 4),
                           round(shared::DOUBLE / n_b, 4)) >= 0.8
        """,
        # Template-pressure audit: string-shingle document frequencies
        # (the hash-identity df distribution up to ~2⁻⁶³ collisions),
        # aggregated to the four audit numbers the capped containment
        # plan needs.  Same shingling CASE as containment_pairs.
        "containment_df_stats": """
            WITH corpus AS (
                SELECT doc_id,
                       coalesce('this site uses cookies to improve '
                                || 'your browsing experience ' || text,
                                '') AS text
                FROM documents
            ),
            sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 5 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks) - 4),
                            i -> array_to_string(
                                     list_slice(toks, i, i + 4), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ),
            inv AS (SELECT unnest(shingles) AS s FROM sh),
            dfreq AS (SELECT s, count(*) AS df FROM inv GROUP BY s)
            SELECT count(*)::BIGINT AS n_shingles,
                   max(df)::BIGINT AS max_df_observed,
                   coalesce(sum(CASE WHEN df > 50 THEN 1 ELSE 0 END),
                            0)::BIGINT AS n_over_cap,
                   coalesce(sum(CASE WHEN df > 50 THEN df ELSE 0 END),
                            0)::BIGINT AS hot_occurrences
            FROM dfreq
        """,
        # DSIR: hashed-feature buckets via the md5-60 arithmetic, add-one
        # smoothed log-ratio per bucket in integer micro-nats, doc-keyed
        # sum; docs with no features kept at (0, 0).
        "dsir_weights": _dsir_weights_oracle(),
        # Gumbel top-k resampling over the same weights: deterministic
        # Gumbel from the md5 unit hash, rank on the ROUNDED key.
        "dsir_resample": _dsir_weights_oracle(
            final="""
            SELECT doc_id, log_weight_micro,
                   round(log_weight_micro / 1000000.0
                         - ln(-ln((('0x' || substr(md5('dsir:'
                               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                               + 0.5) / 1152921504606846976.0)), 6)
                       AS gumbel_key
            FROM weights
            ORDER BY gumbel_key DESC, doc_id
            LIMIT 50
            """
        ),
        # EPUB final-artifact golden: pure-Python replay of extraction →
        # assembly → byte-deterministic EPUB3 zip, md5 per url.
        **(
            (
                {"epub_export": e}
                if (e := _epub_export_oracle()) is not None
                else {}
            )
            | (
                {"epub_roundtrip": r}
                if (r := _epub_roundtrip_oracle()) is not None
                else {}
            )
            | (
                {"isotonic_calibration": iso}
                if (iso := _isotonic_oracle()) is not None
                else {}
            )
            | (
                {"payload_routing": pr}
                if (pr := _payload_routing_oracle()) is not None
                else {}
            )
        ),
        "cohort_retention": """
            WITH d AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                FROM events),
            c AS (
                SELECT user_id, day,
                       min(day) OVER (PARTITION BY user_id) AS cohort
                FROM d)
            SELECT cohort AS cohort_day,
                   day - cohort AS day_offset,
                   count(DISTINCT user_id) AS active_users
            FROM c
            GROUP BY 1, 2
        """,
        # chained conditional-min fixpoint == the Spark side's sorted-array
        # walk: stage k is the min event time of its type STRICTLY after
        # stage k-1 (see operators/analytics.py funnel_stages docstring)
        "funnel_stages": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s1.t1
                GROUP BY e.user_id),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                GROUP BY e.user_id)
            SELECT u.user_id,
                   (CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END)::INT AS stages_reached,
                   epoch_us(t1) AS t1_us,
                   epoch_us(t2) AS t2_us,
                   epoch_us(t3) AS t3_us
            FROM u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,
        "chunk_tokens": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents),
            s AS (
                SELECT doc_id, toks, len(toks) AS n,
                       list_filter(
                           generate_series(1, greatest(1, len(toks)), 48),
                           s -> s = 1 OR s - 48 + 64 - 1 < len(toks)
                       ) AS starts
                FROM t),
            e AS (
                SELECT doc_id, toks, n, starts,
                       unnest(generate_series(1, len(starts))) AS i
                FROM s)
            SELECT doc_id,
                   (i - 1)::INT AS chunk_id,
                   starts[i]::INT AS start_tok,
                   least(64, n - starts[i] + 1)::INT AS n_toks,
                   md5(array_to_string(
                       list_slice(toks, starts[i], starts[i] + 63), ' '))
                       AS chunk_md5
            FROM e
        """,
        # single-window form of the two-phase salted rank (the salted plan
        # reconstructs exactly this kept set); integer ceil, never float
        "stratified_sample": """
            WITH d AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM documents),
            c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
            r AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY h ASC, doc_id ASC) AS rn
                FROM d)
            SELECT r.doc_id, r.lang
            FROM r JOIN c USING (lang)
            WHERE rn <= (n * 1 + 5 - 1) // 5
        """,
        "hits_scores": _hits_oracle(),
        "jsonl_roundtrip": """
            SELECT doc_id,
                   md5(coalesce(text, '')) AS text_md5,
                   strlen(coalesce(text, '')) AS text_bytes,
                   coalesce(lang, '') AS lang,
                   coalesce(source, '') AS source,
                   TRUE AS parsed_ok
            FROM documents
        """,
        # bit-for-bit replay of the hashed linear model: same md5-prefix
        # bucket, same weight arithmetic, same left-to-right token-array
        # summation order (list_sum == HOF aggregate order)
        "classifier_scores": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ts
                FROM documents),
            f AS (
                SELECT doc_id, len(ts) AS n,
                       coalesce(list_sum(list_transform(ts, t ->
                           ((('0x' || substr(md5('feat:' || t), 1, 15))::BIGINT
                             % 1024) % 997) / 996.0 - 0.5)), 0.0) AS s
                FROM toks)
            SELECT doc_id,
                   n::BIGINT AS n_feats,
                   round(s / greatest(1, n), 6)::DOUBLE AS raw_score,
                   round(1.0 / (1.0 + exp(-4.0 * (s / greatest(1, n)))), 6)::DOUBLE
                       AS prob,
                   (1.0 / (1.0 + exp(-4.0 * (s / greatest(1, n)))) >= 0.5)
                       AS keep
            FROM f
        """,
        "event_rolling": """
            SELECT event_id, user_id,
                   count(*) OVER w AS roll_n,
                   round(sum(value) OVER w, 4)::DOUBLE AS roll_sum,
                   round(avg(value) OVER w, 4)::DOUBLE AS roll_avg
            FROM (SELECT event_id, user_id, value,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        "click_attribution": """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
            c AS (
                SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts)
            SELECT p.event_id, p.user_id,
                   CASE WHEN c.click_ts IS NOT NULL
                             AND epoch_us(p.ts) - epoch_us(c.click_ts)
                                 <= 86400000000
                        THEN c.click_id END AS click_id,
                   CASE WHEN c.click_ts IS NOT NULL
                             AND epoch_us(p.ts) - epoch_us(c.click_ts)
                                 <= 86400000000
                        THEN epoch_us(p.ts) - epoch_us(c.click_ts)
                        END AS gap_us
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND c.click_ts <= p.ts
        """,
    }
