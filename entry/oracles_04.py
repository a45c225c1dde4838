"""Oracle SQL fragments (part 4/4 of the mechanical __spark_entry__ split; entries verbatim)."""
from __future__ import annotations

from entry.oracle_helpers import _gate_oracle, _mbox_oracle, _sedump_oracle, _subtitle_oracle, _texttiling_oracle


def oracles() -> dict[str, str]:
    return {
        "compact_postings": """
            WITH src AS (
                SELECT doc_id, text, 0 AS segment FROM documents
                UNION ALL
                SELECT doc_id,
                       regexp_replace(text, '\\s+\\S+\\s*$', '') AS text,
                       1 AS segment
                FROM documents WHERE doc_id % 5 = 0),
            post AS (
                SELECT term, doc_id, count(*)::INT AS tf, segment
                FROM (SELECT doc_id, segment,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS term
                      FROM src)
                GROUP BY term, doc_id, segment)
            SELECT term, doc_id, tf
            FROM post
            -- mirror the operator: winner = max segment among rows that
            -- EXIST (a recrawl yielding zero postings leaves the old
            -- segment in place; deletions need update_postings'
            -- deleted_ids, not compaction)
            QUALIFY segment = max(segment) OVER (PARTITION BY doc_id)
        """,
        "bpe_pairs": """
            WITH vocab AS (
                SELECT word, count(*)::BIGINT AS n FROM (
                    SELECT unnest(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[a-zà-öø-ÿ]+')) AS word
                    FROM documents)
                GROUP BY word
            ), pairs AS (
                SELECT substr(word, i, 2) AS pair, n
                FROM vocab, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
                WHERE length(word) >= 2
            )
            SELECT pair, sum(n)::BIGINT AS weight
            FROM pairs GROUP BY pair
            HAVING sum(n) >= 5
        """,
        "minimizer_sketch": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS tk
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(tk) >= 3 THEN
                           list_transform(generate_series(1, len(tk) - 2),
                               i -> ('0x' || substr(md5(array_to_string(
                                        list_slice(tk, i, i + 2), ' ')),
                                     1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS gs
                FROM toks
            ), mins AS (
                SELECT doc_id,
                       CASE WHEN len(gs) = 0 THEN []::BIGINT[]
                            WHEN len(gs) <= 4 THEN [list_min(gs)]
                            ELSE list_distinct(list_transform(
                                     generate_series(1, len(gs) - 3),
                                     j -> list_min(list_slice(gs, j, j + 3))))
                       END AS ms
                FROM grams
            )
            SELECT doc_id, unnest(ms) AS minimizer FROM mins
        """,
        "minimizer_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       regexp_replace(text, '\\s+\\S+\\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS tk
                FROM corpus
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(tk) >= 3 THEN
                           list_transform(generate_series(1, len(tk) - 2),
                               i -> ('0x' || substr(md5(array_to_string(
                                        list_slice(tk, i, i + 2), ' ')),
                                     1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS gs
                FROM toks
            ), mins AS (
                SELECT doc_id,
                       CASE WHEN len(gs) = 0 THEN []::BIGINT[]
                            WHEN len(gs) <= 4 THEN [list_min(gs)]
                            ELSE list_distinct(list_transform(
                                     generate_series(1, len(gs) - 3),
                                     j -> list_min(list_slice(gs, j, j + 3))))
                       END AS ms
                FROM grams
            ), sk AS (
                SELECT doc_id, unnest(ms) AS minimizer FROM mins
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM sk a JOIN sk b
              ON b.minimizer = a.minimizer AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 5
        """,
        "template_strip": """
            WITH mutated AS (
                SELECT doc_id, source,
                       '(c) ' || source || ' - all rights reserved' || chr(10) ||
                       CASE WHEN (doc_id // 20) % 2 = 0
                            THEN 'We use cookies on ' || source || chr(10)
                            ELSE '' END ||
                       CASE WHEN (doc_id // 20) % 5 = 0
                            THEN 'Limited promo - subscribe today' || chr(10)
                            ELSE '' END ||
                       coalesce(text, '') AS text
                FROM documents
            ), lines AS (
                SELECT doc_id, source, u.pos, u.ln FROM (
                    SELECT doc_id, source,
                           string_split(text, chr(10)) AS lst FROM mutated
                ), UNNEST(list_transform(generate_series(1, len(lst)),
                                         j -> {'pos': j - 1, 'ln': lst[j]})) AS t(u)
            ), gd AS (
                SELECT source, count(DISTINCT doc_id) AS gdocs
                FROM mutated GROUP BY source
            ), tpl AS (
                SELECT d.source, d.ln
                FROM (SELECT DISTINCT source, ln, doc_id FROM lines
                      WHERE regexp_matches(ln, '[^ \\t\\r]')) d
                JOIN gd USING (source)
                GROUP BY d.source, d.ln, gd.gdocs
                HAVING gd.gdocs >= 3 AND count(*) * 2 >= gd.gdocs
            ), marked AS (
                SELECT l.doc_id, l.source, l.pos, l.ln,
                       (t.ln IS NOT NULL) AS is_tpl
                FROM lines l
                LEFT JOIN tpl t ON t.source = l.source AND t.ln = l.ln
            )
            SELECT doc_id, source,
                   md5(coalesce(string_agg(ln, chr(10) ORDER BY pos)
                                FILTER (WHERE NOT is_tpl), '')) AS text_md5,
                   count(*)::BIGINT AS n_lines,
                   coalesce(sum(CASE WHEN is_tpl THEN 1 ELSE 0 END),
                            0)::BIGINT AS n_removed
            FROM marked GROUP BY doc_id, source
        """,
        "snapshot_set_ops": """
            WITH a AS (
                SELECT doc_id, lang FROM documents WHERE doc_id % 3 != 0
                UNION ALL
                SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0),
            b AS (SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0)
            SELECT 'a_minus_b' AS op, doc_id, lang
            FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            UNION ALL
            SELECT 'b_minus_a' AS op, doc_id, lang
            FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
            UNION ALL
            SELECT 'common' AS op, doc_id, lang
            FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        """,
        "event_pivot": """
            SELECT user_id,
                   CAST(sum((event_type = 'click')::BIGINT) AS BIGINT) AS n_click,
                   CAST(sum((event_type = 'error')::BIGINT) AS BIGINT) AS n_error,
                   CAST(sum((event_type = 'purchase')::BIGINT) AS BIGINT) AS n_purchase,
                   CAST(sum((event_type = 'signup')::BIGINT) AS BIGINT) AS n_signup,
                   CAST(sum((event_type = 'view')::BIGINT) AS BIGINT) AS n_view,
                   count(*) AS n_total
            FROM events
            GROUP BY user_id
        """,
        # Degree assortativity: the star+chain construction, canonical
        # distinct edges, degree joins, and exact integer moments all
        # replay as plain SQL; HUGEINT sums == Spark decimal(38,0).
        "degree_assortativity": """
            WITH raw_edges AS (
                SELECT 'hub.example' AS s,
                       's' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS t
                FROM documents
                UNION ALL
                SELECT 's' || CAST(doc_id % 23 AS VARCHAR) || '.example',
                       's' || CAST(doc_id % 23 + 1 AS VARCHAR) || '.example'
                FROM documents WHERE doc_id % 23 < 10
            ), e AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw_edges WHERE s != t
            ), deg AS (
                SELECT node, count(*)::BIGINT AS deg FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e
                ) GROUP BY node
            ), ed AS (
                SELECT da.deg AS da, db.deg AS db
                FROM e JOIN deg da ON e.a = da.node
                       JOIN deg db ON e.b = db.node
            ), mom AS (
                SELECT count(*)::BIGINT AS n_edges,
                       sum(da + db)::HUGEINT AS sx,
                       sum(2 * da * db)::HUGEINT AS sxy,
                       sum(da * da + db * db)::HUGEINT AS sxx
                FROM ed
            )
            SELECT (SELECT count(*)::BIGINT FROM deg) AS n_nodes,
                   n_edges,
                   CASE WHEN (2 * n_edges * sxx - sx * sx) > 0 THEN
                       round((2 * n_edges * sxy - sx * sx)::DOUBLE
                             / (2 * n_edges * sxx - sx * sx)::DOUBLE, 6)
                   END AS assortativity
            FROM mom
        """,
        # Span overlap: the oracle is the NAIVE theta-join the operator
        # refuses to run — grid bucketing + owner-cell dedup must
        # reproduce it exactly, duplicates and all.
        "span_overlap": """
            WITH left_spans AS (
                SELECT doc_id, doc_id * 2 AS a_id,
                       (doc_id % 7) * 10 AS a_start,
                       (doc_id % 7) * 10 + 15 + doc_id % 4 AS a_end
                FROM documents
                UNION ALL
                SELECT doc_id, doc_id * 2 + 1,
                       100 + (doc_id % 5) * 8,
                       112 + (doc_id % 5) * 8
                FROM documents
            ), right_spans AS (
                SELECT doc_id, b_id, b_id * 25 AS b_start,
                       b_id * 25 + 25 AS b_end
                FROM (SELECT doc_id, unnest(generate_series(0, 7)) AS b_id
                      FROM documents)
            )
            SELECT l.doc_id, l.a_id, r.b_id,
                   greatest(a_start, b_start)::BIGINT AS ov_start,
                   least(a_end, b_end)::BIGINT AS ov_end,
                   (least(a_end, b_end)
                    - greatest(a_start, b_start))::BIGINT AS ov_len
            FROM left_spans l JOIN right_spans r
              ON l.doc_id = r.doc_id
             AND l.a_start < r.b_end AND r.b_start < l.a_end
            WHERE l.a_end > l.a_start
        """,
        # RRF fusion: per-(query, run) row_number ranks, integer
        # nano-unit contributions, exact sums, query-local top-10.
        "rrf_fusion": """
            WITH runs AS (
                SELECT doc_id % 5 AS query_id, doc_id,
                       length(text)::DOUBLE AS score, 'lex' AS run_id
                FROM documents
                UNION ALL
                SELECT doc_id % 5, doc_id,
                       ((doc_id * 2654435761) % 1000)::DOUBLE, 'dense'
                FROM documents
            ), ranked AS (
                SELECT query_id, doc_id,
                       CAST(round(1e9 / (60 + row_number() OVER (
                           PARTITION BY query_id, run_id
                           ORDER BY score DESC, doc_id ASC)), 0) AS BIGINT)
                           AS nano
                FROM runs
            ), fused AS (
                SELECT query_id, doc_id,
                       count(*)::BIGINT AS n_runs,
                       sum(nano)::BIGINT AS rrf_nano
                FROM ranked GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, n_runs, rrf_nano,
                   fused_rank::INT AS fused_rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY rrf_nano DESC, doc_id ASC) AS fused_rank
                FROM fused
            ) WHERE fused_rank <= 10
        """,
        # RAKE: the two-pass stopword cut, distinct-phrase scoring and
        # integer micro-unit deg/freq sums all replay in SQL (the
        # stopword alternation is generated from the SAME tuple).
        "rake_keywords": """
            WITH norm AS (
                SELECT ' ' || regexp_replace(lower(text),
                           '[^a-zà-öø-ÿ]+', ' ', 'g') || ' ' AS t
                FROM documents WHERE text IS NOT NULL
            ), cut1 AS (
                SELECT regexp_replace(t, ' (the|and|of|to|a|in|is|was|it|for|on|as|with|that|this|his|her|they|be|at|by|an|are|or|from|had|has|have|not|but|were|which|you|he|she|we|their) ', ' | ', 'g') AS t
                FROM norm
            ), cut2 AS (
                SELECT regexp_replace(t, ' (the|and|of|to|a|in|is|was|it|for|on|as|with|that|this|his|her|they|be|at|by|an|are|or|from|had|has|have|not|but|were|which|you|he|she|we|their) ', ' | ', 'g') AS t
                FROM cut1
            ), phrases AS (
                SELECT trim(regexp_replace(raw, ' +', ' ', 'g')) AS phrase
                FROM (SELECT unnest(string_split(t, '|')) AS raw FROM cut2)
                WHERE trim(regexp_replace(raw, ' +', ' ', 'g')) != ''
            ), occ AS (
                SELECT phrase, count(*)::BIGINT AS n_occ
                FROM phrases GROUP BY phrase HAVING count(*) >= 2
            ), words AS (
                SELECT phrase, n_occ,
                       len(string_split(phrase, ' '))::BIGINT AS n_words,
                       unnest(string_split(phrase, ' ')) AS word
                FROM occ
            ), wscore AS (
                SELECT word,
                       CAST(round(1e6 * sum(n_occ * n_words)::DOUBLE
                                  / sum(n_occ)::DOUBLE, 0) AS BIGINT)
                           AS w_micro
                FROM words GROUP BY word
            ), scored AS (
                SELECT w.phrase, sum(s.w_micro)::BIGINT AS score_micro
                FROM words w JOIN wscore s USING (word)
                GROUP BY w.phrase
            )
            SELECT o.phrase,
                   len(string_split(o.phrase, ' '))::INT AS n_words,
                   o.n_occ AS n_occurrences,
                   sc.score_micro
            FROM occ o JOIN scored sc ON o.phrase = sc.phrase
            ORDER BY sc.score_micro DESC, o.phrase ASC
            LIMIT 40
        """,
        # Feature MI: stack-unpivot as UNION ALL, equal-width bins,
        # micro-nat terms with the count products in doubles.
        "feature_mi": """
            WITH feats AS (
                SELECT 'f_len' AS feature, length(text)::DOUBLE AS x,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR) AS y
                FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT 'f_noise', ((doc_id * 37) % 100)::DOUBLE,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR)
                FROM documents
                UNION ALL
                SELECT 'f_mod', (doc_id % 3)::DOUBLE,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR)
                FROM documents
            ), ranges AS (
                SELECT feature, min(x) AS lo, max(x) AS hi
                FROM feats GROUP BY feature
            ), binned AS (
                SELECT f.feature, f.y,
                       CASE WHEN r.hi > r.lo THEN least(9,
                           CAST(floor((f.x - r.lo) / (r.hi - r.lo) * 10)
                                AS INT))
                       ELSE 0 END AS bin
                FROM feats f JOIN ranges r ON f.feature = r.feature
            ), nxy AS (
                SELECT feature, bin, y, count(*)::BIGINT AS n_xy
                FROM binned GROUP BY feature, bin, y
            ), nx AS (
                SELECT feature, bin, sum(n_xy)::BIGINT AS n_x
                FROM nxy GROUP BY feature, bin
            ), ny AS (
                SELECT feature, y, sum(n_xy)::BIGINT AS n_y
                FROM nxy GROUP BY feature, y
            ), nn AS (
                SELECT feature, sum(n_xy)::BIGINT AS n
                FROM nxy GROUP BY feature
            ), cells AS (
                SELECT c.feature, c.bin,
                       CAST(round(1e6
                            * (c.n_xy::DOUBLE / t.n::DOUBLE)
                            * ln((c.n_xy::DOUBLE * t.n::DOUBLE)
                                 / (x.n_x::DOUBLE * yy.n_y::DOUBLE)), 0)
                            AS BIGINT) AS term,
                       t.n
                FROM nxy c
                JOIN nx x ON c.feature = x.feature AND c.bin = x.bin
                JOIN ny yy ON c.feature = yy.feature AND c.y = yy.y
                JOIN nn t ON c.feature = t.feature
            )
            SELECT feature, max(n)::BIGINT AS n_rows,
                   count(DISTINCT bin)::INT AS n_bins_used,
                   sum(term)::BIGINT AS mi_micro_nats
            FROM cells GROUP BY feature
            ORDER BY mi_micro_nats DESC, feature ASC
        """,
        # PQ assignment: the arithmetic codebook, inclusive list_slice
        # subvectors, per-dimension nano-rounded squared deltas and the
        # (dist, code) lexicographic argmin replay exactly.
        "pq_quantize": """
            WITH cent AS (
                SELECT s.subspace, c.code,
                       list_transform(generate_series(0, 7), j ->
                           (((s.subspace * 131 + c.code * 31 + j * 17)
                             % 200) - 100)::DOUBLE / 100.0) AS cvec
                FROM (SELECT unnest(generate_series(0, 7)) AS subspace) s,
                     (SELECT unnest(generate_series(0, 15)) AS code) c
            ), sub AS (
                SELECT vec_id, s.subspace,
                       list_slice(embedding, s.subspace * 8 + 1,
                                  s.subspace * 8 + 8) AS sv
                FROM embeddings,
                     (SELECT unnest(generate_series(0, 7)) AS subspace) s
            ), scored AS (
                SELECT vec_id, sub.subspace, cent.code,
                       list_sum(list_transform(generate_series(1, 8), j ->
                           CAST(round((sv[j]::DOUBLE - cvec[j])
                                      * (sv[j]::DOUBLE - cvec[j])
                                      * 1e9, 0) AS BIGINT)))::BIGINT AS d
                FROM sub JOIN cent ON sub.subspace = cent.subspace
            )
            SELECT vec_id, subspace::INT AS subspace, code::INT AS code,
                   d AS dist_nano
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, subspace
                    ORDER BY d ASC, code ASC) AS rn
                FROM scored
            ) WHERE rn = 1
        """,
        # Continuation pairs: the synthetic continuation corpus, the
        # whitespace tokenization, head/tail md5-60 bridge hashes, the
        # >16 fanout drop and the equi-join replay in SQL.
        "continuation_pairs": """
            WITH elig AS (
                SELECT doc_id, text,
                       string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM documents
                WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 8
            ), corpus AS (
                SELECT doc_id * 2 AS id, text FROM elig
                UNION ALL
                SELECT doc_id * 2 + 1,
                       array_to_string(
                           list_slice(t, len(t) - 7, len(t)), ' ')
                       || ' continued section ' || CAST(doc_id AS VARCHAR)
                FROM elig
            ), toks AS (
                SELECT id,
                       string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM corpus
                WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 8
            ), hashed AS (
                SELECT id,
                       ('0x' || substr(md5(array_to_string(
                           list_slice(t, 1, 8), ' ')), 1, 15))::BIGINT AS h,
                       ('0x' || substr(md5(array_to_string(
                           list_slice(t, len(t) - 7, len(t)), ' ')),
                           1, 15))::BIGINT AS tl
                FROM toks
            ), hot AS (
                SELECT h AS bridge FROM hashed GROUP BY h
                HAVING count(*) > 16
                UNION
                SELECT tl FROM hashed GROUP BY tl HAVING count(*) > 16
            )
            SELECT a.id AS id_a, b.id AS id_b, a.tl AS bridge_hash
            FROM hashed a JOIN hashed b ON a.tl = b.h AND a.id != b.id
            WHERE a.tl NOT IN (SELECT bridge FROM hot)
        """,
        # Capitalized runs: the augmented corpus, the multi-word
        # [A-Z][a-z]+ run regex and the capitalized-stopword-first
        # filter (list generated from the SAME tuple) replay in SQL.
        "capitalized_phrases": """
            WITH names(nm, i) AS (
                VALUES ('Arlon', 0), ('Brixton', 1), ('Calder', 2),
                       ('Dorset', 3), ('Elgin', 4), ('Farrow', 5),
                       ('Galway', 6)
            ), aug AS (
                SELECT d.text || ' Saint ' || n1.nm
                       || ' went to the The Old ' || n2.nm || '.' AS text
                FROM documents d
                JOIN names n1 ON n1.i = d.doc_id % 7
                JOIN names n2 ON n2.i = (d.doc_id * 2) % 7
            ), runs AS (
                SELECT unnest(regexp_extract_all(text,
                    '[A-Z][a-z]+( [A-Z][a-z]+)+', 0)) AS phrase
                FROM aug
            ), kept AS (
                SELECT phrase, count(*)::BIGINT AS n_mentions
                FROM runs
                WHERE string_split(phrase, ' ')[1] NOT IN ('The', 'And', 'Of', 'To', 'A', 'In', 'Is', 'Was', 'It', 'For', 'On', 'As', 'With', 'That', 'This', 'His', 'Her', 'They', 'Be', 'At', 'By', 'An', 'Are', 'Or', 'From', 'Had', 'Has', 'Have', 'Not', 'But', 'Were', 'Which', 'You', 'He', 'She', 'We', 'Their')
                GROUP BY phrase
                HAVING count(*) >= 2
            )
            SELECT phrase,
                   len(string_split(phrase, ' '))::INT AS n_words,
                   n_mentions
            FROM kept
            ORDER BY n_mentions DESC, phrase ASC
            LIMIT 40
        """,
        # Otsu: equal-width histogram, cumulative moments over the
        # bins table, micro-unit between-class variance, lower-bin
        # tie-break.
        "otsu_threshold": """
            WITH clean AS (
                SELECT (CASE WHEN doc_id % 3 = 0 THEN 80 + doc_id % 7
                             ELSE 20 + doc_id % 11 END)::DOUBLE AS x
                FROM documents
            ), rng AS (
                SELECT min(x) AS lo, max(x) AS hi,
                       count(*)::BIGINT AS n FROM clean
            ), hist AS (
                SELECT CASE WHEN r.hi > r.lo THEN least(31,
                           CAST(floor((c.x - r.lo) / (r.hi - r.lo) * 32)
                                AS INT))
                       ELSE 0 END AS bin,
                       count(*)::BIGINT AS n
                FROM clean c, rng r
                GROUP BY 1
            ), cum AS (
                SELECT bin,
                       sum(n) OVER (ORDER BY bin)::BIGINT AS w0,
                       sum(n * bin) OVER (ORDER BY bin)::BIGINT AS s0,
                       (SELECT sum(n)::BIGINT FROM hist) AS W,
                       (SELECT sum(n * bin)::BIGINT FROM hist) AS S
                FROM hist
            ), scored AS (
                SELECT bin, w0, W,
                       CAST(round(1e6
                           * ((w0::DOUBLE / W::DOUBLE)
                              * (1.0 - w0::DOUBLE / W::DOUBLE))
                           * (((s0::DOUBLE / w0::DOUBLE)
                               - ((S - s0)::DOUBLE / (W - w0)::DOUBLE))
                              * ((s0::DOUBLE / w0::DOUBLE)
                                 - ((S - s0)::DOUBLE / (W - w0)::DOUBLE))),
                           0) AS BIGINT) AS var_micro
                FROM cum WHERE w0 < W
            ), best AS (
                SELECT * FROM scored
                ORDER BY var_micro DESC, bin ASC LIMIT 1
            )
            SELECT r.n AS n_rows,
                   round(r.lo, 6) AS lo,
                   round(r.hi, 6) AS hi,
                   b.bin::INT AS threshold_bin,
                   CASE WHEN b.bin IS NOT NULL THEN
                       round(r.lo + (b.bin + 1) * ((r.hi - r.lo) / 32), 6)
                   END AS threshold_value,
                   b.var_micro,
                   b.w0 AS n_below,
                   (b.W - b.w0)::BIGINT AS n_above
            FROM rng r LEFT JOIN best b ON TRUE
        """,
        # Heading→body pairs: one combined regex stream, window cumsum
        # section ids, ORDER BY pos string_agg bodies.
        "heading_body_pairs": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><p>orphan intro</p><h1>Title '
                       || doc_id || '</h1><p>alpha ' || (doc_id % 7)
                       || '</p><p>beta <b>bold</b></p>'
                       || CASE WHEN doc_id % 3 = 0
                               THEN '<h2>Methods</h2><p>gamma '
                                    || (doc_id % 5) || '</p>'
                               ELSE '<h2>Empty Section</h2>' END
                       || '</body></html>' AS html
                FROM documents
            ), m AS (
                SELECT doc_id, u.pos, u.m FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<h[1-6][^>]*>.*?</h[1-6]\\s*>|<p[^>]*>.*?</p\\s*>')
                               AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'm': lst[j]}))
                    AS t(u)
            ), tagged AS (
                SELECT doc_id, pos,
                       regexp_matches(m, '(?is)^<h[1-6]') AS is_h,
                       regexp_extract(m, '(?i)^<h([1-6])', 1) AS lvl,
                       trim(regexp_replace(regexp_replace(m,
                            '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))
                           AS txt,
                       sum(CASE WHEN regexp_matches(m, '(?is)^<h[1-6]')
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos) AS sec
                FROM m
            ), heads AS (
                SELECT doc_id, sec::INT AS section_id, lvl::INT AS level,
                       txt AS heading
                FROM tagged WHERE is_h
            ), bodies AS (
                SELECT doc_id, sec::INT AS section_id,
                       count(*)::BIGINT AS n_paras,
                       string_agg(txt, ' ' ORDER BY pos) AS body
                FROM tagged WHERE NOT is_h AND sec > 0
                GROUP BY doc_id, sec
            )
            SELECT h.doc_id, h.section_id, h.level, h.heading,
                   coalesce(b.n_paras, 0)::BIGINT AS n_paras, b.body
            FROM heads h LEFT JOIN bodies b
              ON h.doc_id = b.doc_id AND h.section_id = b.section_id
        """,
        # Site sections: URL parse, first/second path segments, per-
        # domain top cut.
        "site_sections": """
            WITH urls AS (
                SELECT CASE WHEN doc_id % 4 = 3
                    THEN 'https://s' || (doc_id % 5) || '.example'
                    ELSE 'https://s' || (doc_id % 5) || '.example/'
                         || CASE WHEN doc_id % 4 = 0 THEN 'news'
                                 WHEN doc_id % 4 = 1 THEN 'blog'
                                 ELSE 'shop' END
                         || '/'
                         || CASE WHEN doc_id % 4 = 0
                                 THEN 'y' || (doc_id % 3)
                                 ELSE 'p' || (doc_id % 9) END
                         || '?ref=' || (doc_id % 2)
                    END AS url
                FROM documents
            ), parsed AS (
                SELECT regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS domain,
                       list_filter(string_split(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'),
                           x -> x != '') AS segs
                FROM urls
            ), keyed AS (
                SELECT domain,
                       CASE WHEN len(segs) >= 1 THEN segs[1]
                            ELSE '(root)' END AS section,
                       CASE WHEN len(segs) >= 2 THEN segs[2] END AS sub
                FROM parsed WHERE domain != ''
            ), agg AS (
                SELECT domain, section, count(*)::BIGINT AS n_pages,
                       count(DISTINCT sub)::BIGINT AS n_subsections
                FROM keyed GROUP BY domain, section
            )
            SELECT domain, section, n_pages, n_subsections FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY domain
                    ORDER BY n_pages DESC, section ASC) AS rn
                FROM agg
            ) WHERE rn <= 3
        """,
        # Winsorize: quantile_cont == Spark exact percentile; bounds
        # rounded BEFORE clamping on both sides.
        "winsorize_scores": """
            WITH d AS (
                SELECT doc_id, 'd' || (doc_id % 7) AS domain,
                       (CASE WHEN doc_id % 97 = 0 THEN 500 + doc_id % 13
                             ELSE 50 + doc_id % 23 END)::DOUBLE AS score
                FROM documents
            ), b AS (
                SELECT domain,
                       round(quantile_cont(score, 0.05), 6) AS lo_bound,
                       round(quantile_cont(score, 0.95), 6) AS hi_bound
                FROM d GROUP BY domain
            )
            SELECT d.doc_id, d.domain, d.score, b.lo_bound, b.hi_bound,
                   round(least(greatest(d.score, b.lo_bound), b.hi_bound),
                         6) AS score_w,
                   (d.score < b.lo_bound OR d.score > b.hi_bound)
                       AS clipped
            FROM d LEFT JOIN b ON d.domain = b.domain
        """,
        # PRF expansion: the explode+group BM25 replica picks the same
        # rounded-score top-25; expansion weights are exact micro sums.
        "prf_expansion": """
            WITH base AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS toks
                FROM documents),
            consts AS (
                SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
            toks AS (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM base),
            hits AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM toks
                WHERE term IN ('merge', 'spark', 'window')
                GROUP BY doc_id, dl, term),
            dfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
            scored AS (
                SELECT h.doc_id,
                       ROUND(SUM(
                           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * (h.tf * (1.2 + 1.0))
                           / (h.tf + 1.2 * (1.0 - 0.75
                                            + 0.75 * h.dl / c.avgdl))
                       ), 6)::DOUBLE AS score
                FROM hits h
                JOIN dfreq d USING (term)
                CROSS JOIN consts c
                GROUP BY h.doc_id),
            fb AS (
                SELECT doc_id FROM scored
                ORDER BY score DESC, doc_id LIMIT 25),
            ftoks AS (
                SELECT t.doc_id, t.dl, t.term
                FROM toks t SEMI JOIN fb ON t.doc_id = fb.doc_id),
            filt AS (
                SELECT * FROM ftoks
                WHERE length(term) >= 3 AND term NOT IN ('a', 'an', 'and', 'are', 'as', 'at', 'be', 'but', 'by', 'for', 'from', 'had', 'has', 'have', 'he', 'her', 'his', 'in', 'is', 'it', 'merge', 'not', 'of', 'on', 'or', 'she', 'spark', 'that', 'the', 'their', 'they', 'this', 'to', 'was', 'we', 'were', 'which', 'window', 'with', 'you')),
            per_doc AS (
                SELECT doc_id, term, dl, count(*)::BIGINT AS tf
                FROM filt GROUP BY doc_id, term, dl),
            contrib AS (
                SELECT term,
                       CAST(round(1e6 * tf::DOUBLE / dl::DOUBLE, 0)
                            AS BIGINT) AS w
                FROM per_doc)
            SELECT term, count(*)::BIGINT AS n_docs,
                   sum(w)::BIGINT AS weight_micro
            FROM contrib GROUP BY term
            ORDER BY weight_micro DESC, term ASC
            LIMIT 15
        """,
        # LSH banding planner: pure S-curve arithmetic replay.
        "lsh_plan": """
            WITH divs AS (
                SELECT b::INT AS bands, (64 // b)::INT AS "rows"
                FROM (SELECT unnest(generate_series(1, 64)) AS b)
                WHERE 64 % b = 0
            ), g AS (
                SELECT bands, "rows",
                       unnest(generate_series(1, 99)) AS gi
                FROM divs
            ), t2 AS (
                SELECT bands, "rows", gi, gi::DOUBLE / 100.0 AS j,
                       1.0 - pow(1.0 - pow(gi::DOUBLE / 100.0,
                                           "rows"::DOUBLE),
                                 bands::DOUBLE) AS p
                FROM g
            ), micro AS (
                SELECT bands, "rows",
                       CASE WHEN j < 0.5
                            THEN CAST(round(1e6 * p, 0) AS BIGINT)
                            ELSE 0 END AS fp_t,
                       CASE WHEN j < 0.5 THEN 0
                            ELSE CAST(round(1e6 * (1.0 - p), 0) AS BIGINT)
                            END AS fn_t
                FROM t2
            ), agg AS (
                SELECT bands, "rows", sum(fp_t)::BIGINT AS fp_micro,
                       sum(fn_t)::BIGINT AS fn_micro
                FROM micro GROUP BY bands, "rows"
            )
            SELECT bands, "rows", round(pow(1.0 / bands::DOUBLE,
                       1.0 / "rows"::DOUBLE), 6) AS threshold_est,
                   fp_micro, fn_micro,
                   (fp_micro + fn_micro)::BIGINT AS err_micro
            FROM agg ORDER BY err_micro, bands
        """,
        # N-gram novelty: shingle strings replay exactly (the Spark
        # side hashes them 64-bit only for shuffle width; novelty
        # depends on equality alone, exact up to 2^-64 collisions).
        "ngram_novelty": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 10 = 0
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 5 THEN
                           list_distinct(list_transform(
                               generate_series(1, len(toks) - 5 + 1),
                               i -> array_to_string(
                                   list_slice(toks, i, i + 5 - 1), ' ')))
                       ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ), ex AS (
                SELECT doc_id, unnest(shingles) AS s FROM sh
            ), firsts AS (
                SELECT s, min(doc_id) AS first_id FROM ex GROUP BY s
            )
            SELECT e.doc_id, count(*)::BIGINT AS n_shingles,
                   sum((f.first_id = e.doc_id)::INT)::BIGINT AS n_novel,
                   round(sum((f.first_id = e.doc_id)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS novelty
            FROM ex e JOIN firsts f ON e.s = f.s
            GROUP BY e.doc_id
        """,
        # Domain dup rates: md5 keeper-min + domain rollup.
        "domain_dup_rates": """
            WITH corpus AS (
                SELECT doc_id, 'd' || (doc_id % 7) AS domain, text
                FROM documents
                UNION ALL
                SELECT doc_id + 10000000,
                       'd' || ((doc_id + 10000000) % 7), text
                FROM documents WHERE doc_id % 5 = 4
            ), h AS (
                SELECT domain, doc_id, md5(text) AS m FROM corpus
            ), keep AS (
                SELECT m, min(doc_id) AS k FROM h GROUP BY m
            )
            SELECT h.domain, count(*)::BIGINT AS n_docs,
                   sum((h.doc_id != k.k)::INT)::BIGINT AS n_dups,
                   round(sum((h.doc_id != k.k)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS dup_rate
            FROM h JOIN keep k ON h.m = k.m
            GROUP BY h.domain
        """,
        # JL projection: md5-parity signs, micro-rounded per-dimension
        # products, exact integer fold, shared /1e6/sqrt(16) finish.
        "jl_project": """
            WITH dims AS (
                SELECT unnest(generate_series(0, 15)) AS dim
            ), proj AS (
                SELECT vec_id, d.dim,
                       list_sum(list_transform(
                           generate_series(1, len(embedding)), j ->
                           CAST((CASE WHEN (1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END)) >= 0
                             THEN floor(1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END) + 0.5)
                             ELSE ceil(1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END) - 0.5)
                             END) AS BIGINT)))::BIGINT AS m
                FROM embeddings, dims d
            )
            SELECT vec_id, dim::INT AS dim,
                   (CASE WHEN m >= 0 THEN floor(m::DOUBLE / 4.0 + 0.5)
                         ELSE ceil(m::DOUBLE / 4.0 - 0.5)
                    END) / 1e6 AS proj
            FROM proj
        """,
        # DOCX extraction: replay sources/docx.doc_blocks relationally —
        # tokens (str.split semantics via filtered \s+ split) chunk into
        # 40-token paragraphs, a Heading1 "Section {doc}.{k} — R&D
        # <draft>" opens every 6th chunk, every 4th body chunk opens
        # with a hard tab; empty docs still emit their opening heading.
        "docx_extract_blocks": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub, 'heading' AS block_type,
                       'Section ' || doc_id || '.' || (k // 6)
                           || ' — R&D <draft>' AS text
                FROM ks WHERE k % 6 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       CASE WHEN k % 4 = 0 THEN chr(9) ELSE '' END ||
                       array_to_string(
                           list_slice(toks, k * 40 + 1, (k + 1) * 40), ' ')
                FROM ks WHERE k < nc
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, sub)::BIGINT
                       AS block_id,
                   block_type, text
            FROM rows_
        """,
        # DOCX chapters: running heading count over the same block
        # replay, then a per-(doc, chapter) rollup.
        "docx_chapters": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub, 'heading' AS block_type,
                       'Section ' || doc_id || '.' || (k // 6)
                           || ' — R&D <draft>' AS text
                FROM ks WHERE k % 6 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       CASE WHEN k % 4 = 0 THEN chr(9) ELSE '' END ||
                       array_to_string(
                           list_slice(toks, k * 40 + 1, (k + 1) * 40), ' ')
                FROM ks WHERE k < nc
            ), numbered AS (
                SELECT doc_id, block_type, text,
                       sum((block_type = 'heading')::INT) OVER (
                           PARTITION BY doc_id ORDER BY k, sub
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS chapter_id
                FROM rows_
            )
            SELECT doc_id, chapter_id,
                   max(CASE WHEN block_type = 'heading' THEN text END)
                       AS title,
                   sum((block_type = 'para')::INT)::BIGINT AS n_paras,
                   coalesce(sum(CASE WHEN block_type = 'para'
                                     THEN length(text) ELSE 0 END),
                            0)::BIGINT AS n_chars
            FROM numbered
            GROUP BY doc_id, chapter_id
        """,
        # Access gates: replay the fixture mutation + marker regexp
        # counts (marker lists imported from operators/gates.py so the
        # two sides cannot drift).
        "gate_signals": _gate_oracle(
            """
            SELECT doc_id, domain, n_words, paywall_hits, consent_hits,
                   (paywall_hits >= 2 AND n_words <= 120) AS is_paywalled,
                   (consent_hits >= 2) AS is_consent_gated
            FROM sig
            """
        ),
        "gate_rates": _gate_oracle(
            """
            SELECT domain, count(*)::BIGINT AS n_pages,
                   sum((paywall_hits >= 2 AND n_words <= 120)::INT)::BIGINT
                       AS n_paywalled,
                   sum((consent_hits >= 2)::INT)::BIGINT AS n_consent_gated,
                   round(sum((paywall_hits >= 2 AND n_words <= 120)::INT
                         )::DOUBLE / count(*)::DOUBLE, 6) AS paywall_rate,
                   round(sum((consent_hits >= 2)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS consent_rate
            FROM sig
            GROUP BY domain
            """
        ),
        # TextTiling: the shared scoring pipeline, gaps surfaced as-is.
        "texttiling_gaps": _texttiling_oracle(
            """
            SELECT doc_id, gap::BIGINT AS gap,
                   sim_micro::BIGINT AS sim_micro,
                   depth_micro::BIGINT AS depth_micro, is_boundary
            FROM scored
            """
        ),
        # Tiles: boundary gaps open segments; a boundary-free (or
        # single-pseudo-sentence) document is one tile.
        "text_segments": _texttiling_oracle(
            """
            , starts AS (
                SELECT doc_id, 0::BIGINT AS start_ps FROM np
                UNION ALL
                SELECT doc_id, gap FROM scored WHERE is_boundary
            )
            SELECT s.doc_id,
                   row_number() OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps) AS seg_id,
                   start_ps,
                   coalesce(lead(start_ps) OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps),
                       n.n_ps) - 1 AS end_ps,
                   coalesce(lead(start_ps) OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps),
                       n.n_ps) - start_ps AS n_ps
            FROM starts s JOIN np n USING (doc_id)
            """
        ),
        # Subtitle cues: expected timing/text straight from the tokens
        # (8-token cues, 2.5 s pitch, 5 s silence before every 10th cue,
        # first 4 tokens on line 1) — independent of the string
        # round-trip, so writer∘parser must be the identity.
        "srt_cues": _subtitle_oracle(
            """
            SELECT doc_id, (cue + 1)::BIGINT AS cue_id,
                   (cue * 2500 + (cue // 10) * 5000)::BIGINT AS start_ms,
                   (cue * 2500 + (cue // 10) * 5000 + 2400)::BIGINT
                       AS end_ms,
                   array_to_string(list_slice(ct, 1, 4), ' ')
                   || CASE WHEN len(ct) > 4
                           THEN chr(10) || array_to_string(
                               list_slice(ct, 5, len(ct)), ' ')
                           ELSE '' END AS text
            FROM cu
            """
        ),
        # Transcripts: paragraphs at the scheduled silences (cue // 10),
        # cue-internal line breaks flatten to spaces.
        "srt_transcripts": _subtitle_oracle(
            """
            , fl AS (
                SELECT doc_id, cue, cue // 10 AS para,
                       array_to_string(ct, ' ') AS flat
                FROM cu
            ), paras AS (
                SELECT doc_id, para, count(*) AS n,
                       string_agg(flat, ' ' ORDER BY cue) AS ptext
                FROM fl GROUP BY doc_id, para
            )
            SELECT doc_id, sum(n)::BIGINT AS n_cues,
                   count(*)::BIGINT AS n_paras,
                   string_agg(ptext, chr(10) || chr(10) ORDER BY para)
                       AS transcript
            FROM paras GROUP BY doc_id
            """
        ),
        # Wikitext blocks: replay sources/wikitext.doc_wiki_blocks —
        # 30-token chunks, an alternating h2/h3 heading before every 5th
        # chunk, markup resolving back to the bare tokens.
        "wikitext_blocks": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 29) // 30 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub,
                       CASE WHEN (k // 5) % 2 = 0 THEN 'h2' ELSE 'h3' END
                           AS block_type,
                       'Heading ' || doc_id || '.' || (k // 5) AS text
                FROM ks WHERE k % 5 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       array_to_string(
                           list_slice(toks, k * 30 + 1, (k + 1) * 30), ' ')
                FROM ks WHERE k < nc
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, sub)::BIGINT
                       AS block_id,
                   block_type, text
            FROM rows_
        """,
        # Wikitext links: within-chunk positions i%11==0 are plain links
        # (target = token), i%11==5 piped links (target = 'T:'||token);
        # link_id numbers document order.
        "wikitext_links": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, len(toks) AS nw,
                       (len(toks) + 29) // 30 AS nc
                FROM d
            ), ks AS (
                SELECT doc_id, toks, nw, nc,
                       unnest(generate_series(0, nc - 1)) AS k
                FROM c WHERE nc >= 1
            ), pos AS (
                SELECT doc_id, k, u.i - 1 AS i, toks[k * 30 + u.i] AS tok
                FROM ks, unnest(generate_series(1, 30)) AS u(i)
                WHERE k * 30 + u.i <= nw
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, i)::BIGINT
                       AS link_id,
                   CASE WHEN i % 11 = 0 THEN tok
                        ELSE 'T:' || tok END AS target,
                   tok AS anchor
            FROM pos WHERE i % 11 IN (0, 5)
        """,
        # Two-column PDFs: the column-aware sort must recover the
        # ORIGINAL linear flow, so the expected rows derive straight
        # from the words — title line, then 8-word lines flowing down
        # 6-row columns, two columns per page.
        "pdf_two_column_blocks": """
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
            ), w AS (
                SELECT doc_id,
                       CASE WHEN text = '' THEN []::VARCHAR[]
                            ELSE string_split(text, ' ') END AS words
                FROM d
            ), n AS (
                SELECT doc_id, words,
                       1 + (len(words) + 7) // 8 AS n_lines
                FROM w
            ), ls AS (
                SELECT doc_id, words,
                       unnest(generate_series(0, n_lines - 1)) AS l
                FROM n
            )
            SELECT doc_id, l::BIGINT AS block_id,
                   (l // 12)::BIGINT AS page,
                   ((l % 12) // 6)::BIGINT AS "column",
                   CASE WHEN l = 0 THEN 'heading'
                        ELSE 'paragraph' END AS block_type,
                   CASE WHEN l = 0 THEN 'Document ' || doc_id
                        ELSE array_to_string(
                            list_slice(words, (l - 1) * 8 + 1, l * 8), ' ')
                        END AS text
            FROM ls
        """,
        # mbox: expected clean messages straight from the tokens —
        # 50-token messages, a "From the desk…" opener, 10-token body
        # lines, Re:-chained subjects, one quoted line per reply.
        "mbox_messages": _mbox_oracle(
            """
            SELECT doc_id, (m + 1)::BIGINT AS msg_id, subject,
                   n_quoted::BIGINT AS n_quoted, body
            FROM msgs
            """
        ),
        # Dialogue pairs: each reply answers the previous <=2 turns.
        "dialogue_pairs": _mbox_oracle(
            """
            SELECT doc_id, m::BIGINT AS pair_id,
                   CASE WHEN lag2 IS NULL THEN lag1
                        ELSE lag2 || chr(10) || '---' || chr(10) || lag1
                        END AS prompt,
                   body AS response
            FROM (
                SELECT doc_id, m, body,
                       lag(body, 1) OVER (
                           PARTITION BY doc_id ORDER BY m) AS lag1,
                       lag(body, 2) OVER (
                           PARTITION BY doc_id ORDER BY m) AS lag2
                FROM msgs
            )
            WHERE lag1 IS NOT NULL
            """
        ),
        # Stack-Exchange dump: every post row straight from the tokens —
        # 40-token posts, 8-token lines, deterministic scores, argmax
        # accepted answer.
        "sedump_posts": _sedump_oracle(
            """
            SELECT doc_id, post_id, post_type, parent_id, accepted_id,
                   score, title, body
            FROM posts
            """
        ),
        # Q&A SFT pairs: question joined to its accepted (= argmax)
        # answer; n_answers = posts − 1 by construction.
        "qa_sft_pairs": _sedump_oracle(
            """
            SELECT q.doc_id, q.title, q.body AS prompt,
                   a.body AS response, a.score AS best_score,
                   (q.np - 1)::BIGINT AS n_answers,
                   (a.post_id = q.accepted_id) AS is_accepted
            FROM posts q JOIN posts a
              ON a.doc_id = q.doc_id AND a.post_id = q.accepted_id
            WHERE q.post_type = 1
            """
        ),
        # k-anonymity / l-diversity: equivalence classes of the quasi
        # triple with strict >= flags.
        "k_anonymity": """
            WITH q AS (
                SELECT doc_id, lang, source,
                       coalesce(n_chars, 0) // 400 AS band
                FROM documents
            )
            SELECT lang, source, band,
                   count(*)::BIGINT AS class_size,
                   count(DISTINCT doc_id)::BIGINT AS n_sensitive,
                   (count(*) >= 5) AS k_anonymous,
                   (count(DISTINCT doc_id) >= 3) AS l_diverse
            FROM q GROUP BY lang, source, band
        """,
        # Entropy / recursive-(c,l) diversity: per-value counts joined
        # to class totals, each entropy term one correctly-rounded
        # float of exact ints quantized to micro-nats (order-free sum),
        # ln(3)*1e6 threshold as the shared Python literal 1098612.
        "diversity_audit": """
            WITH q AS (
                SELECT lang, coalesce(n_chars, 0) // 400 AS band, source
                FROM documents
            ), pv AS (
                SELECT lang, band, source AS v, count(*)::BIGINT AS rv
                FROM q GROUP BY 1, 2, 3
            ), tot AS (
                SELECT lang, band, sum(rv)::BIGINT AS n
                FROM pv GROUP BY 1, 2
            ), terms AS (
                SELECT pv.lang, pv.band, pv.rv,
                       CAST(round(-(pv.rv::DOUBLE / t.n)
                                  * ln(pv.rv::DOUBLE / t.n)
                                  * 1e6) AS BIGINT) AS term
                FROM pv JOIN tot t USING (lang, band)
            ), cls AS (
                SELECT lang, band,
                       sum(rv)::BIGINT AS class_size,
                       count(*)::BIGINT AS n_sensitive,
                       sum(term)::BIGINT AS entropy_micro,
                       list(rv ORDER BY rv DESC) AS rs
                FROM terms GROUP BY 1, 2
            )
            SELECT lang, band, class_size, n_sensitive, entropy_micro,
                   (entropy_micro >= 1098612) AS entropy_l_diverse,
                   rs[1]::BIGINT AS top_count,
                   coalesce(list_sum(list_slice(rs, 3, len(rs))), 0)::BIGINT
                       AS tail_sum,
                   (n_sensitive >= 3 AND
                    rs[1] < 2 * coalesce(list_sum(list_slice(rs, 3, len(rs))), 0))
                       AS recursive_cl_diverse
            FROM cls
        """,
        # t-closeness: class-vs-global TVD over the full sensitive
        # domain (absent values contribute their global mass); exact
        # HUGEINT numerator, one rounded division, literal 200000.
        "t_closeness": """
            WITH q AS (
                SELECT lang, coalesce(n_chars, 0) // 400 AS band, source
                FROM documents
            ), pv AS (
                SELECT lang, band, source AS v, count(*)::HUGEINT AS cv
                FROM q GROUP BY 1, 2, 3
            ), g AS (
                SELECT source AS v, count(*)::HUGEINT AS gv
                FROM q GROUP BY 1
            ), tot AS (SELECT count(*)::HUGEINT AS N FROM q),
            cls AS (
                SELECT lang, band, sum(cv)::HUGEINT AS class_size
                FROM pv GROUP BY 1, 2
            ), x AS (
                SELECT c.lang, c.band, c.class_size,
                       abs(coalesce(pv.cv, 0) * tot.N
                           - g.gv * c.class_size) AS term
                FROM cls c
                CROSS JOIN g
                LEFT JOIN pv ON pv.lang IS NOT DISTINCT FROM c.lang
                            AND pv.band IS NOT DISTINCT FROM c.band
                            AND pv.v IS NOT DISTINCT FROM g.v
                CROSS JOIN tot
            )
            SELECT lang, band, class_size::BIGINT AS class_size,
                   CAST(round(sum(term)::DOUBLE
                              / (2::DOUBLE * class_size::DOUBLE
                                 * (SELECT N FROM tot)::DOUBLE)
                              * 1e6) AS BIGINT) AS tvd_micro,
                   (CAST(round(sum(term)::DOUBLE
                               / (2::DOUBLE * class_size::DOUBLE
                                  * (SELECT N FROM tot)::DOUBLE)
                               * 1e6) AS BIGINT) <= 200000) AS t_close
            FROM x GROUP BY lang, band, class_size
        """,
        # Generalization ladder: unnest widths, one class count per
        # rung, argmin satisfying width via a scalar subquery.
        "k_generalization": """
            WITH w AS (
                SELECT unnest([400, 800, 1600, 3200, 6400, 12800, 25600])
                           AS width),
            cls AS (
                SELECT w.width, lang, source,
                       coalesce(n_chars, 0) // w.width AS band,
                       count(*)::BIGINT AS n
                FROM documents CROSS JOIN w
                GROUP BY 1, 2, 3, 4),
            rungs AS (
                SELECT width, count(*)::BIGINT AS n_classes,
                       min(n)::BIGINT AS min_class_size
                FROM cls GROUP BY 1),
            best AS (
                SELECT min(width) AS b FROM rungs
                WHERE min_class_size >= 5)
            SELECT r.width::INTEGER AS width, r.n_classes,
                   r.min_class_size,
                   (r.min_class_size >= 5) AS k_anonymous,
                   coalesce(r.width = (SELECT b FROM best), FALSE)
                       AS chosen
            FROM rungs r
        """,
        # Suppression: quasi cells NULLed for rows in sub-k classes.
        "quasi_suppression": """
            WITH q AS (
                SELECT doc_id, lang, source,
                       coalesce(n_chars, 0) // 400 AS band
                FROM documents
            ), sized AS (
                SELECT doc_id, lang, source, band,
                       count(*) OVER (PARTITION BY lang, source, band)
                           AS cs
                FROM q
            )
            SELECT doc_id,
                   CASE WHEN cs < 5 THEN NULL ELSE lang END AS lang,
                   CASE WHEN cs < 5 THEN NULL ELSE source END AS source,
                   CASE WHEN cs < 5 THEN NULL ELSE band END AS band,
                   (cs < 5) AS suppressed
            FROM sized
        """,
        # Anchor weak supervision: md5-bucketed negatives replayed with
        # the same 60-bit md5-prefix arithmetic as the Spark side.
        "anchor_query_pairs": """
            WITH corpus AS (
                SELECT 'doc://' || doc_id AS url, text FROM documents
            ), pairs AS (
                SELECT 'topic ' || (d.doc_id % 17) || ' guide '
                           || (d.doc_id % 4) AS query,
                       'doc://' || (d.doc_id - d.doc_id % 10) AS pos_url
                FROM documents d
            ), pos AS (
                SELECT p.query, p.pos_url, c.text AS pos_text
                FROM pairs p JOIN corpus c ON p.pos_url = c.url
            ), reps AS (
                SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT % 16 AS b,
                       min(url) AS lo_url,
                       arg_min(text, url) AS lo_text,
                       max(url) AS hi_url,
                       arg_max(text, url) AS hi_text
                FROM corpus GROUP BY 1
            ), qb AS (
                SELECT query, pos_url, pos_text,
                       ('0x' || substr(md5(query || chr(31) || pos_url),
                                       1, 15))::BIGINT % 16 AS qb
                FROM pos
            )
            SELECT query, pos_url, pos_text,
                   CASE WHEN lo_url <> pos_url THEN lo_url
                        WHEN hi_url <> pos_url THEN hi_url END AS neg_url,
                   CASE WHEN lo_url <> pos_url THEN lo_text
                        WHEN hi_url <> pos_url THEN hi_text END AS neg_text
            FROM qb LEFT JOIN reps ON qb.qb = reps.b
        """,
        # Markdown meta: the fixture is fully deterministic, so every
        # output column replays as closed-form string arithmetic.
        "markdown_meta": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, toks,
                       CASE doc_id % 3 WHEN 0 THEN 'en'
                            WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
                       CASE doc_id % 3 WHEN 0 THEN 'python'
                            WHEN 1 THEN 'js' ELSE 'sql' END AS flang
                FROM d
            )
            SELECT doc_id, true AS has_front_matter,
                   'Doc ' || doc_id AS fm_title,
                   lang AS fm_lang,
                   1::BIGINT AS n_fences,
                   flang AS first_fence_lang,
                   length('```' || flang || chr(10) || 'code_line('
                          || doc_id || ')' || chr(10) || 'x = '
                          || (doc_id % 9) || chr(10) || '```')::BIGINT
                       AS code_chars,
                   (length(array_to_string(list_slice(toks, 1, 40), ' '))
                    + 2 +
                    length(coalesce(array_to_string(
                        list_slice(toks, 41, len(toks)), ' '), '')))::BIGINT
                       AS prose_chars
            FROM s
        """,
        # Unified diffs: closed-form replay of the fixture spec —
        # 60-token files of 10-token lines, j%4==1 dels, j%4==2 adds.
        "unidiff_stats": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 59) // 60 AS nf
                FROM d WHERE len(toks) >= 1
            ), fs AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, nf - 1)) AS f
                FROM n
            ), ch AS (
                SELECT doc_id, f,
                       (len(list_slice(toks, f * 60 + 1, f * 60 + 60)) + 9)
                           // 10 AS nl
                FROM fs
            ), js AS (
                SELECT doc_id, f, unnest(generate_series(0, nl - 1)) AS j
                FROM ch
            )
            SELECT doc_id, (f + 1)::BIGINT AS file_id,
                   'src/mod_' || doc_id || '_' || f || '.py' AS path,
                   1::BIGINT AS n_hunks,
                   sum((j % 4 = 2)::INT)::BIGINT AS n_adds,
                   sum((j % 4 = 1)::INT)::BIGINT AS n_dels,
                   sum((j % 4 NOT IN (1, 2))::INT)::BIGINT AS n_context
            FROM js GROUP BY doc_id, f
        """,
        # Jupyter notebooks: closed-form replay of the fixture spec —
        # 12-token cells of 4-token lines, cell i is code iff i%3==2.
        # n_chars = reassembled source text = token lengths + one
        # separator per gap (line joins use ' ', line breaks '\n').
        "ipynb_cells": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 11) // 12 AS nc
                FROM d WHERE len(toks) >= 1
            ), cs AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, nc - 1)) AS i
                FROM n
            ), c AS (
                SELECT doc_id, i,
                       list_slice(toks, i * 12 + 1, i * 12 + 12) AS ct
                FROM cs
            )
            SELECT doc_id, (i + 1)::BIGINT AS cell_id,
                   CASE WHEN i % 3 = 2 THEN 'code'
                        ELSE 'markdown' END AS cell_type,
                   CASE WHEN i % 3 = 2 THEN (i + 1)::INT
                        END AS execution_count,
                   ((len(ct) + 3) // 4)::INT AS n_lines,
                   length(array_to_string(ct, ' '))::INT AS n_chars
            FROM c
        """,
        # LaTeX articles: closed-form replay of the fixture spec —
        # 40-token sections (3-token title, 8-token body lines); body
        # line j: equation iff j%5==3, comment iff j%5==4, else prose
        # with one cite on even j.  LEFT JOIN keeps body-less sections.
        "latex_sections": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS ns
                FROM d WHERE len(toks) >= 1
            ), sec AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, ns - 1)) AS s
                FROM n
            ), sb AS (
                SELECT doc_id, s,
                       array_to_string(
                           list_slice(toks, s * 40 + 1, s * 40 + 3), ' ')
                           AS title,
                       (len(list_slice(toks, s * 40 + 4, s * 40 + 40)) + 7)
                           // 8 AS nl
                FROM sec
            ), js AS (
                SELECT doc_id, s, unnest(generate_series(0, nl - 1)) AS j
                FROM sb
            ), agg AS (
                SELECT doc_id, s,
                       sum((j % 5 = 3)::INT) AS n_eq,
                       sum((j % 5 = 4)::INT) AS n_comment,
                       sum((j % 5 NOT IN (3, 4) AND j % 2 = 0)::INT)
                           AS n_cite,
                       sum((j % 5 NOT IN (3, 4))::INT) AS n_prose
                FROM js GROUP BY doc_id, s
            )
            SELECT sb.doc_id, (sb.s + 1)::BIGINT AS sec_id, sb.title,
                   coalesce(agg.n_eq, 0)::BIGINT AS n_eq,
                   coalesce(agg.n_comment, 0)::BIGINT AS n_comment,
                   coalesce(agg.n_cite, 0)::BIGINT AS n_cite,
                   coalesce(agg.n_prose, 0)::BIGINT AS n_prose_lines
            FROM sb LEFT JOIN agg
                ON sb.doc_id = agg.doc_id AND sb.s = agg.s
        """,
        "llr_keyness": """
            WITH toks AS (
                SELECT lang,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS w
                FROM documents),
            ca AS (SELECT w, count(*)::BIGINT AS k_a FROM toks
                   WHERE lang = 'en' GROUP BY w),
            cb AS (SELECT w, count(*)::BIGINT AS k_b FROM toks
                   WHERE lang <> 'en' GROUP BY w),
            na AS (SELECT sum(k_a)::BIGINT AS n_a FROM ca),
            nb AS (SELECT sum(k_b)::BIGINT AS n_b FROM cb),
            j AS (
                SELECT coalesce(ca.w, cb.w) AS word,
                       coalesce(k_a, 0)::BIGINT AS k_a,
                       coalesce(k_b, 0)::BIGINT AS k_b
                FROM ca FULL OUTER JOIN cb ON ca.w = cb.w
                WHERE coalesce(k_a, 0) + coalesce(k_b, 0) >= 5),
            m AS (
                SELECT word, k_a, k_b,
                       k_a::DOUBLE AS ka, k_b::DOUBLE AS kb,
                       n_a, n_b,
                       n_a::DOUBLE AS da, n_b::DOUBLE AS db
                FROM j, na, nb)
            SELECT word, k_a, k_b,
                   round(2.0 * (
                       (CASE WHEN ka > 0 THEN ka * ln(ka /
                            (da * ((ka + kb) / (da + db)))) ELSE 0.0 END)
                     + (CASE WHEN kb > 0 THEN kb * ln(kb /
                            (db * ((ka + kb) / (da + db)))) ELSE 0.0 END)
                   ), 6) + 0.0 AS g2,
                   CASE WHEN k_a::HUGEINT * n_b::HUGEINT
                             > k_b::HUGEINT * n_a::HUGEINT THEN 'a'
                        WHEN k_a::HUGEINT * n_b::HUGEINT
                             < k_b::HUGEINT * n_a::HUGEINT THEN 'b'
                        ELSE 'tie' END AS enriched_in
            FROM m
        """,
        "rank_sum_test": """
            WITH d AS (
                SELECT (doc_id % 2)::VARCHAR AS g,
                       ((doc_id * 13) % 40 + 5 * (doc_id % 2))::BIGINT AS v
                FROM documents),
            pv AS (
                SELECT v, count(*)::HUGEINT AS c,
                       sum((g = '0')::INT)::HUGEINT AS c_a
                FROM d GROUP BY v),
            rk AS (
                SELECT v, c, c_a,
                       coalesce(sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS off
                FROM pv),
            s AS (
                SELECT sum(c_a * (2 * off + c + 1)) AS two_r_a,
                       sum(c * c * c - c) AS tie_sum,
                       sum(c_a)::BIGINT AS n_a,
                       sum(c - c_a)::BIGINT AS n_b
                FROM rk),
            m AS (
                SELECT n_a, n_b,
                       two_r_a::DOUBLE / 2.0
                           - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0 AS u_a,
                       n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
                       tie_sum::DOUBLE AS ts
                FROM s),
            v2 AS (
                SELECT n_a, n_b, u_a, na, nb,
                       na * nb - u_a AS u_b,
                       (na * nb / 12.0) * ((na + nb + 1.0)
                           - ts / ((na + nb) * (na + nb - 1.0))) AS var
                FROM m)
            SELECT '0' AS group_a, '1' AS group_b, n_a, n_b,
                   u_a + 0.0 AS u_a, u_b + 0.0 AS u_b,
                   CASE WHEN var > 0
                        THEN round((u_a - na * nb / 2.0) / sqrt(var), 6)
                             + 0.0
                   END AS z,
                   CASE WHEN var > 0 THEN
                       abs((u_a - na * nb / 2.0) / sqrt(var))
                           > 1.959963984540054::DOUBLE
                   ELSE FALSE END AS significant
            FROM v2
        """,
        "surt_keys": r"""
            WITH built AS (
                SELECT doc_id,
                       'HTTP://'
                       || CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
                               WHEN doc_id % 4 = 1 THEN 'www2.'
                               WHEN doc_id % 4 = 2 THEN 'M.'
                               ELSE '' END
                       || 'News' || CAST(doc_id % 7 AS VARCHAR)
                       || '.Example.COM'
                       || CASE WHEN doc_id % 3 = 0 THEN ':8080'
                               ELSE '' END
                       || CASE WHEN doc_id % 2 = 0
                               THEN '/Path/' || CAST(doc_id AS VARCHAR)
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1'
                               WHEN doc_id % 5 = 1 THEN '?z=9&&a=1'
                               ELSE '' END
                       || CASE WHEN doc_id % 6 = 0 THEN '#Frag'
                               ELSE '' END AS url
                FROM documents),
            s1 AS (SELECT doc_id, url,
                          regexp_replace(
                              regexp_replace(lower(url), '#.*$', ''),
                              '^[a-z][a-z0-9+.\-]*://', '') AS u
                   FROM built),
            s2 AS (SELECT doc_id, url, u,
                          regexp_extract(u, '^([^/?]*)', 1) AS head
                   FROM s1),
            s3 AS (SELECT doc_id, url,
                          substr(u, length(head) + 1) AS rest,
                          regexp_extract(head, ':(\d+)$', 1) AS port,
                          regexp_replace(
                              regexp_replace(head, ':\d+$', ''),
                              '^www\d*\.', '') AS host
                   FROM s2),
            s4 AS (SELECT doc_id, url, port,
                          array_to_string(
                              list_reverse(string_split(host, '.')),
                              ',') AS rev,
                          regexp_extract(rest, '^([^?]*)', 1) AS path,
                          regexp_extract(rest, '^[^?]*\?(.*)$', 1)
                              AS query
                   FROM s3),
            s5 AS (SELECT doc_id, url, port, rev, path,
                          array_to_string(list_sort(list_filter(
                              string_split(query, '&'),
                              p -> p <> '')), '&') AS qs
                   FROM s4)
            SELECT doc_id, url,
                   rev
                   || CASE WHEN port <> '' THEN ':' || port ELSE '' END
                   || ')'
                   || CASE WHEN path = '' THEN '/' ELSE path END
                   || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                       AS surt
            FROM s5
        """,
        "cdx_prefixes": """
            WITH built AS (
                SELECT 'com,site' || CAST(doc_id % 11 AS VARCHAR)
                           AS surt_prefix,
                       'com,site' || CAST(doc_id % 11 AS VARCHAR)
                           || ',sub' || CAST(doc_id % 5 AS VARCHAR)
                           || ')/p/' || CAST(doc_id % 20 AS VARCHAR)
                           AS surt
                FROM documents)
            SELECT surt_prefix, count(*)::BIGINT AS n_captures,
                   count(DISTINCT surt)::BIGINT AS n_urls
            FROM built GROUP BY surt_prefix
        """,
        "matryoshka_recall": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < 20),
            nq AS (SELECT count(DISTINCT query_id)::BIGINT AS n_queries
                   FROM q),
            fullr AS (
                SELECT query_id, vec_id FROM (
                    SELECT q.query_id, e.vec_id,
                           row_number() OVER (PARTITION BY q.query_id
                               ORDER BY list_dot_product(e.v, q.qv)
                                   / (sqrt(list_dot_product(e.v, e.v))
                                      * sqrt(list_dot_product(q.qv, q.qv)))
                                   DESC,
                               e.vec_id ASC) AS rnk
                    FROM e CROSS JOIN q)
                WHERE rnk <= 10),
            dims(dim) AS (VALUES (4), (8), (16)),
            truncr AS (
                SELECT dim, query_id, vec_id FROM (
                    SELECT d.dim, q.query_id, e.vec_id,
                           row_number() OVER (
                               PARTITION BY d.dim, q.query_id
                               ORDER BY
                                   list_dot_product(e.v[1:d.dim],
                                                    q.qv[1:d.dim])
                                   / (sqrt(list_dot_product(e.v[1:d.dim],
                                                            e.v[1:d.dim]))
                                      * sqrt(list_dot_product(
                                            q.qv[1:d.dim],
                                            q.qv[1:d.dim]))) DESC,
                               e.vec_id ASC) AS rnk
                    FROM e CROSS JOIN q CROSS JOIN dims d)
                WHERE rnk <= 10),
            hits AS (
                SELECT d.dim, count(*)::BIGINT AS hits
                FROM dims d
                LEFT JOIN (
                    SELECT t.dim FROM truncr t
                    JOIN fullr f ON t.query_id = f.query_id
                                AND t.vec_id = f.vec_id) m
                    ON m.dim = d.dim
                GROUP BY d.dim)
            SELECT h.dim::INT AS dim, nq.n_queries,
                   (CASE WHEN h.hits IS NULL THEN 0 ELSE h.hits END)
                       AS hits,
                   round(h.hits::DOUBLE / (nq.n_queries::DOUBLE * 10.0),
                         6) + 0.0 AS recall
            FROM hits h, nq
        """,
        "hard_negatives": """
            WITH docs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n,
                             sum(len(ws))::DOUBLE AS sumdl
                      FROM docs),
            post AS (
                SELECT term, doc_id, dl, count(*)::INT AS tf FROM (
                    SELECT doc_id, len(ws) AS dl, unnest(ws) AS term
                    FROM docs)
                GROUP BY term, doc_id, dl),
            dfreq AS (
                SELECT term, count(*)::INT AS df FROM post
                GROUP BY term HAVING count(*) <= 400),
            pairs AS (
                SELECT doc_id AS query_id, doc_id AS pos_id,
                       ws[1:3] AS qws
                FROM docs WHERE doc_id % 7 = 0),
            qt AS (
                SELECT DISTINCT query_id, unnest(qws) AS term
                FROM pairs),
            cand AS (
                SELECT qt.query_id, p.doc_id,
                       sum(round(
                           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * ((p.tf * (1.2 + 1.0))
                              / (p.tf + 1.2 * (1.0 - 0.75
                                  + (0.75 * p.dl) / (s.sumdl / s.n))))
                           * 1e6)::BIGINT)::BIGINT AS sm
                FROM qt
                JOIN post p ON qt.term = p.term
                JOIN dfreq d ON qt.term = d.term, stats s
                GROUP BY qt.query_id, p.doc_id),
            ranked AS (
                SELECT query_id, doc_id, sm::DOUBLE / 1e6 AS score,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY sm DESC, doc_id ASC) AS rnk
                FROM cand),
            negs AS (
                SELECT t.query_id, t.doc_id, t.score,
                       row_number() OVER (PARTITION BY t.query_id
                           ORDER BY t.rnk) AS rn
                FROM (SELECT * FROM ranked WHERE rnk <= 10) t
                JOIN pairs pr ON t.query_id = pr.query_id
                             AND t.doc_id <> pr.pos_id)
            SELECT pr.query_id, pr.pos_id,
                   n.doc_id AS neg_id, n.score + 0.0 AS neg_score
            FROM pairs pr
            LEFT JOIN (SELECT * FROM negs WHERE rn = 1) n
                ON pr.query_id = n.query_id
        """,
        # Stateful-streaming replay (entry/queries_08.py): batch
        # membership is doc_id parity (+ planted mirrors), so the
        # applyInPandasWithState semantics replay exactly — per content
        # hash, the FIRST batch containing it emits that batch's
        # (warc_ts, url) minimum with the batch's other copies counted;
        # later batches are suppressed.  documents.text has no NULLs at
        # driver scales, so the url-sentinel hash branch never fires.
        "streaming_first_seen": """
            WITH pages AS (
                SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       TIMESTAMP '2025-01-01 00:00:00'
                         + (doc_id % 60) * INTERVAL 1 MINUTE AS warc_ts,
                       text, CAST(doc_id % 2 AS INT) AS batch
                FROM documents
                UNION ALL
                SELECT 'mirror://' || CAST(doc_id AS VARCHAR),
                       TIMESTAMP '2025-01-01 00:00:00'
                         + (doc_id % 60 + 1) * INTERVAL 1 MINUTE,
                       text, 1
                FROM documents
                WHERE doc_id % 10 = 0 OR doc_id % 20 = 1
            ),
            hashed AS (
                SELECT sha256(text) AS doc_hash, url, warc_ts, batch
                FROM pages
            ),
            firstb AS (
                SELECT doc_hash, min(batch) AS batch
                FROM hashed GROUP BY doc_hash
            ),
            inb AS (
                SELECT h.doc_hash, h.url, h.warc_ts,
                       count(*) OVER (PARTITION BY h.doc_hash) - 1
                           AS n_dupes,
                       row_number() OVER (PARTITION BY h.doc_hash
                                          ORDER BY h.warc_ts, h.url) AS rn
                FROM hashed h
                JOIN firstb f
                  ON f.doc_hash = h.doc_hash AND f.batch = h.batch
            )
            SELECT doc_hash, url, warc_ts,
                   n_dupes::BIGINT AS n_dupes_in_batch
            FROM inb WHERE rn = 1
        """,
        # Stream-stream interval-join replay: the pair set is decided by
        # the interval predicate (watermarks only bound state), so a
        # plain SQL interval join replays the append-mode stream result.
        "stream_label_join": """
            WITH pages AS (
                SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       TIMESTAMP '2025-01-01 00:00:00'
                         + (doc_id % 60) * INTERVAL 1 MINUTE AS warc_ts
                FROM documents
            ),
            labels AS (
                SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       'lab' || CAST(doc_id AS VARCHAR) AS label,
                       TIMESTAMP '2025-01-01 00:00:00'
                         + (doc_id % 60 + doc_id % 8)
                           * INTERVAL 1 MINUTE AS label_ts
                FROM documents
                UNION ALL
                SELECT 'ghost://' || CAST(doc_id AS VARCHAR), 'orphan',
                       TIMESTAMP '2025-01-01 00:00:00'
                         + (doc_id % 60) * INTERVAL 1 MINUTE
                FROM documents WHERE doc_id % 50 = 0
            )
            SELECT p.url, p.warc_ts, l.label, l.label_ts
            FROM pages p
            JOIN labels l
              ON p.url = l.url
             AND l.label_ts >= p.warc_ts
             AND l.label_ts <= p.warc_ts + INTERVAL 5 MINUTE
        """,
    }
