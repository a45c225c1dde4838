"""Oracle SQL fragments (part 1/4 of the mechanical __spark_entry__ split; entries verbatim)."""
from __future__ import annotations

from entry._shared import _LANG_MARKER_SQL, _PDF_LPP, _PDF_WPL
from entry.queries_01 import _cdc_incremental_oracle, _cdc_oracle, _delta_chain_oracle, _snapshot_delta_oracle
from entry.queries_02 import _domain_communities_oracle, _domain_pagerank_oracle, _recrawl_drift_oracle, _trust_rank_oracle
from entry.queries_03 import _compression_oracle
from entry.queries_05 import _CONTAM_SPANS_SQL_CORE
from entry.oracle_helpers import _GOPHER_ORACLE, _shingle_jaccard_oracle


def oracles() -> dict[str, str]:
    lang_votes = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, len(list_filter("
        f"regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'), w -> w IN {markers}"
        f")) AS score FROM documents"
        for lang, markers in sorted(_LANG_MARKER_SQL.items())
    )
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders)
            WHERE rn = 1
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        # relational replay of sources/pdf.doc_to_pdf's layout mapping: the
        # Spark side must recover these lines FROM THE PDF BYTES (inflate,
        # text-operator walk, coordinate sort) — scrambled content order
        # makes a content-order-trusting parser fail the hash
        "pdf_extract_blocks": f"""
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
                           list_slice(ws, (i - 1) * {_PDF_WPL} + 1,
                                      i * {_PDF_WPL}), ' ') AS text
                FROM (
                    SELECT doc_id, ws,
                           unnest(generate_series(
                               1, CAST(ceil(len(ws) / {_PDF_WPL}.0) AS BIGINT)
                           )) AS i
                    FROM words))
            SELECT doc_id, block_id, block_id // {_PDF_LPP} AS page,
                   CASE WHEN block_id = 0 THEN 'heading'
                        ELSE 'paragraph' END AS block_type,
                   text
            FROM lines
        """,
        "building_segment_orders": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderpriority
        """,
        "ordered_lineitem_concat": """
            SELECT l_orderkey,
                   string_agg(CAST(l_linenumber AS VARCHAR), ','
                              ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "event_deltas": """
            SELECT event_id,
                   round(value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
            FROM events
        """,
        "error_islands": """
            SELECT event_id FROM (
                SELECT event_id, event_type,
                       lag(event_type) OVER w AS prev,
                       lead(event_type) OVER w AS nxt
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            WHERE event_type = 'error'
              AND coalesce(prev, '_') <> 'error'
              AND coalesce(nxt, '_') <> 'error'
        """,
        "doc_classification": r"""
            SELECT lang,
                   CASE WHEN regexp_matches(text, '\bspark\b') THEN 'spark'
                        WHEN regexp_matches(text, '\bjoin\b') THEN 'join'
                        ELSE 'other' END AS doc_class,
                   count(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        "trim_leading_blanks": r"""
            SELECT doc_id,
                   length(regexp_replace('   ' || chr(10) || '  ' || text,
                                         '^\s+', '')) AS trimmed_len
            FROM documents
        """,
        "top_parts": """
            SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
            FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "dedup_exact": """
            WITH recrawl AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents)
            SELECT md5(text) AS content_hash, count(*) AS n_docs,
                   min(doc_id) AS keeper_id
            FROM recrawl GROUP BY md5(text) HAVING count(*) > 1
        """,
        "dedup_exact_survivors": """
            WITH recrawl AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents)
            SELECT min(doc_id) AS doc_id FROM recrawl GROUP BY md5(text)
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+')) AS n_words
            FROM documents
        """,
        # Single global window cumsum — the exact result the two-phase
        # score-bucket reconstruction must reproduce bit-for-bit.
        "token_budget": """
            WITH feats AS (
                SELECT doc_id,
                       round(length(regexp_replace(text,
                               '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                             / greatest(length(text), 1), 6) AS score,
                       len(regexp_extract_all(lower(text),
                               '[a-zà-öø-ÿ]+'))::BIGINT AS n_tokens
                FROM documents)
            SELECT doc_id, score, n_tokens,
                   (sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens,
                   ((sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING)) <= 100000) AS selected
            FROM feats
        """,
        # Mirrors operators/textstats.quality_features exactly: run-delete
        # counting ≡ keep-class counting; words = accented-letter runs;
        # stopwords = the English marker set.
        "quality_scores": """
            WITH feats AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       length(regexp_replace(text,
                           '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g')) AS alpha_chars,
                       length(text) - length(regexp_replace(text,
                           '[\\.,;:!\\?"''—–-]+', '', 'g')) AS punct_chars,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS words
                FROM documents)
            SELECT doc_id,
                   round(alpha_chars / greatest(n_chars, 1), 4) AS alpha_ratio,
                   round(punct_chars / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(alpha_chars / greatest(len(words), 1), 4) AS mean_word_len,
                   round(len(list_filter(words, w -> w IN
                         ('the','and','of','to','a','in','is','was')))
                         / greatest(len(words), 1), 4) AS stopword_ratio
            FROM feats
        """,
        "lang_guess": f"""
            SELECT doc_id, lang AS lang_guess FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, lang ASC) AS rn
                FROM ({lang_votes}))
            WHERE rn = 1
        """,
        # Same injection + sequential (email -> ip -> phone) scrub replayed
        # in RE2; patterns are engine-portable by construction.
        "pii_scrub": r"""
            WITH injected AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com from 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.7'
                            || CASE WHEN doc_id % 3 = 0
                               THEN ' call +1 415 555 0'
                                    || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
                               ELSE '' END AS text
                FROM documents),
            s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS text
                FROM injected),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(text,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                       regexp_replace(text,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS text
                FROM s1),
            s3 AS (
                SELECT doc_id, n_email, n_ip,
                       len(regexp_extract_all(text, '\+?\d[\d() -]{6,}\d'))
                           AS n_phone,
                       regexp_replace(text, '\+?\d[\d() -]{6,}\d',
                           '<PHONE>', 'g') AS text
                FROM s2)
            SELECT doc_id, n_email::BIGINT AS n_email, n_ip::BIGINT AS n_ip,
                   n_phone::BIGINT AS n_phone, md5(text) AS clean_md5
            FROM s3
        """,
        # Pseudonymization replay: inject the same emails/ip, then per
        # class sort distinct matches (length desc, value asc) via
        # struct sort and fold literal replaces with list_reduce
        # (list_prepend makes the text the fold init).
        "pseudonymize_pii": r"""
            WITH inj AS (
                SELECT doc_id,
                       coalesce(text, '')
                       || ' contact u' || CAST(doc_id % 50 AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.com or u' || CAST(doc_id % 50 AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.com from 10.0.'
                       || CAST(doc_id % 200 AS VARCHAR)
                       || '.' || CAST(doc_id % 250 AS VARCHAR) AS text
                FROM documents),
            em AS (
                SELECT doc_id, text,
                       list_transform(
                           list_sort(list_transform(
                               list_distinct(regexp_extract_all(text,
                                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
                               m -> {'l': -length(m), 'v': m})),
                           st -> st.v) AS ms
                FROM inj),
            em2 AS (
                SELECT doc_id, len(ms)::BIGINT AS n_email_ids,
                       list_reduce(
                           list_prepend(text, ms),
                           (acc, m) -> replace(acc, m,
                               '<EMAIL:' || substr(md5('pii:' || m), 1, 12)
                               || '>')) AS text
                FROM em),
            ip AS (
                SELECT doc_id, n_email_ids, text,
                       list_transform(
                           list_sort(list_transform(
                               list_distinct(regexp_extract_all(text,
                                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')),
                               m -> {'l': -length(m), 'v': m})),
                           st -> st.v) AS ms
                FROM em2),
            ip2 AS (
                SELECT doc_id, n_email_ids, len(ms)::BIGINT AS n_ip_ids,
                       list_reduce(
                           list_prepend(text, ms),
                           (acc, m) -> replace(acc, m,
                               '<IP:' || substr(md5('pii:' || m), 1, 12)
                               || '>')) AS text
                FROM ip)
            SELECT doc_id, n_email_ids, n_ip_ids, text AS pseudo_text
            FROM ip2
        """,
        # Gopher §A1.1 rules recomputed relationally; ratios rounded to 4
        # in both engines, keep computed on the unrounded doubles.
        "gopher_quality": _GOPHER_ORACLE,
        # webgraph PageRank: static pure-Python replay (edge set is a pure
        # function of doc_id residues, identical at both test scales)
        "domain_pagerank": _domain_pagerank_oracle(),
        "domain_communities": _domain_communities_oracle(),
        # grams rebuilt per n on each side, SEMI JOIN membership;
        # short docs contribute nothing (len guard mirrors the gate)
        "ngram_coverage": r"""
            WITH 
            tr1 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 1 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 1
            ),
            te1 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 1 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 1
            ),
            tr2 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 2 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 2 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 2
            ),
            te2 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 2 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 2 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 2
            ),
            tr3 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 3 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 3 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 3
            ),
            te3 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 3 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 3 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 3
            )

            SELECT 1 AS n,
                   (SELECT count(*) FROM te1)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te1 SEMI JOIN tr1 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te1 SEMI JOIN tr1 USING (g))
                         / greatest((SELECT count(*) FROM te1), 1)::DOUBLE,
                         6) AS coverage
            UNION ALL
            SELECT 2 AS n,
                   (SELECT count(*) FROM te2)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te2 SEMI JOIN tr2 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te2 SEMI JOIN tr2 USING (g))
                         / greatest((SELECT count(*) FROM te2), 1)::DOUBLE,
                         6) AS coverage
            UNION ALL
            SELECT 3 AS n,
                   (SELECT count(*) FROM te3)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te3 SEMI JOIN tr3 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te3 SEMI JOIN tr3 USING (g))
                         / greatest((SELECT count(*) FROM te3), 1)::DOUBLE,
                         6) AS coverage
        """,
        # span replay core + cross-bench merge + correlated-lambda token
        # rewrite; untouched docs hash their ORIGINAL text
        "mask_contaminated": _CONTAM_SPANS_SQL_CORE + """,
            sp AS (
                -- DISTINCT + (s, e) window order: duplicate spans from
                -- two benches tie on s, and untied window passes may
                -- order them differently (flag/grp disagree, merge
                -- splits nondeterministically — observed)
                SELECT DISTINCT doc_id, s, e FROM (
                    SELECT doc_id, min(pos) AS s, max(e) AS e
                    FROM g2 GROUP BY doc_id, bench_id, grp)
            ),
            m0 AS (
                SELECT *, max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pmax
                FROM sp
            ),
            m1 AS (
                SELECT *, CASE WHEN pmax IS NULL OR s > pmax + 1
                               THEN 1 ELSE 0 END AS flag
                FROM m0
            ),
            m2 AS (
                SELECT *, sum(flag) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS grp2
                FROM m1
            ),
            ms AS (
                SELECT doc_id, min(s) AS s, max(e) AS e
                FROM m2 GROUP BY doc_id, grp2
            ),
            arr AS (
                SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS spans,
                       sum(e - s + 1)::INTEGER AS n_masked
                FROM ms GROUP BY doc_id
            ),
            rt AS (
                -- CASE-PRESERVING rebuild tokens (span indexes come from
                -- the lowered split; \\s+ indices are case-independent)
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS rtoks
                FROM documents
            ),
            outp AS (
                SELECT t.doc_id,
                       CASE WHEN a.spans IS NULL THEN d.text
                            ELSE array_to_string(list_transform(
                                generate_series(1, len(rt.rtoks)),
                                i -> CASE WHEN len(list_filter(a.spans,
                                         sp -> i - 1 >= sp.s
                                               AND i - 1 <= sp.e)) > 0
                                     THEN '<REDACTED>'
                                     ELSE rt.rtoks[i] END), ' ')
                       END AS text,
                       CASE WHEN d.text IS NULL THEN NULL
                            ELSE len(t.toks) END AS n_tokens,
                       coalesce(a.n_masked, 0) AS n_masked
                FROM t
                JOIN documents d USING (doc_id)
                JOIN rt USING (doc_id)
                LEFT JOIN arr a USING (doc_id)
            )
            SELECT doc_id, md5(text) AS masked_md5,
                   n_tokens::INTEGER AS n_tokens,
                   n_masked::INTEGER AS n_masked
            FROM outp
        """,
        "trust_rank": _trust_rank_oracle(),
        # head-metadata replayed arithmetically from the same doc_id rules
        # sitemap locs replayed arithmetically (even docs: two urlset
        # locs incl. the CDATA one; odd docs: one flagged index loc)
        "sitemap_urls": """
            WITH s AS (
                SELECT doc_id AS i,
                       'https://s' || (doc_id % 3) || '.example/sm'
                       || doc_id || '.xml' AS url
                FROM documents)
            SELECT url, loc, is_index FROM (
                SELECT url,
                       'https://s' || (i % 3) || '.example/u' || i AS loc,
                       FALSE AS is_index
                FROM s WHERE i % 2 = 0
                UNION ALL
                SELECT url, 'https://s' || (i % 3) || '.example/c' || i,
                       FALSE
                FROM s WHERE i % 2 = 0
                UNION ALL
                SELECT url,
                       'https://s' || (i % 3) || '.example/child' || i
                       || '.xml',
                       TRUE
                FROM s WHERE i % 2 = 1)
        """,
        # frontier replay: same target construction as page_outlinks
        # (targets are already canonical by construction), minus the
        # even-doc ext crawl set, per-domain row_number cap of 5
        "crawl_frontier": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       '/dir' || (doc_id % 3) AS dir
                FROM documents),
            tgt AS (
                SELECT DISTINCT target FROM (
                    SELECT 'https://ext' || (i % 5) || '.example.org/x'
                           || i AS target FROM src
                    UNION ALL
                    SELECT 'https://cdn' || (i % 2) || '.example.net/y'
                    FROM src
                    UNION ALL
                    SELECT origin || '/root' || (i % 4) || '.html' FROM src
                    UNION ALL
                    SELECT origin || dir || '/rel' || (i % 6) || '.html'
                    FROM src
                    UNION ALL
                    SELECT origin || dir || '/uq' || (i % 6) || '.html'
                    FROM src)),
            fresh AS (
                SELECT target FROM tgt
                WHERE target NOT IN (
                    SELECT 'https://ext' || (doc_id % 5)
                           || '.example.org/x' || doc_id
                    FROM documents WHERE doc_id % 2 = 0)),
            ranked AS (
                SELECT CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END AS domain,
                       target,
                       ROW_NUMBER() OVER (PARTITION BY CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END ORDER BY target) AS rank
                FROM fresh)
            SELECT domain, target, rank FROM ranked WHERE rank <= 5
        """,
        # snapshot-diff statuses replayed from the residue rules (11th
        # removed, 5th changed, 13th gains a sibling; removed wins over
        # changed because the page is absent from the new crawl)
        "recrawl_diff": """
            SELECT 'https://d.example/p' || doc_id AS url,
                   CASE WHEN doc_id % 11 = 0 THEN 'removed'
                        WHEN doc_id % 5 = 0 THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents
            UNION ALL
            SELECT 'https://d.example/new' || doc_id, 'added'
            FROM documents WHERE doc_id % 13 = 0
        """,
        # the frontier replay again, joined with the fixture's arithmetic
        # Crawl-delay (2 s on r%3==1 site domains, 1 s default elsewhere)
        "crawl_schedule": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       '/dir' || (doc_id % 3) AS dir
                FROM documents),
            tgt AS (
                SELECT DISTINCT target FROM (
                    SELECT 'https://ext' || (i % 5) || '.example.org/x'
                           || i AS target FROM src
                    UNION ALL
                    SELECT 'https://cdn' || (i % 2) || '.example.net/y'
                    FROM src
                    UNION ALL
                    SELECT origin || '/root' || (i % 4) || '.html' FROM src
                    UNION ALL
                    SELECT origin || dir || '/rel' || (i % 6) || '.html'
                    FROM src
                    UNION ALL
                    SELECT origin || dir || '/uq' || (i % 6) || '.html'
                    FROM src)),
            fresh AS (
                SELECT target FROM tgt
                WHERE target NOT IN (
                    SELECT 'https://ext' || (doc_id % 5)
                           || '.example.org/x' || doc_id
                    FROM documents WHERE doc_id % 2 = 0)),
            ranked AS (
                SELECT CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END AS domain,
                       target,
                       ROW_NUMBER() OVER (PARTITION BY CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END ORDER BY target) AS rank
                FROM fresh)
            SELECT domain, target, rank,
                   ROUND((rank - 1) * CASE
                       WHEN domain LIKE 'site%.example'
                            AND CAST(regexp_extract(domain,
                                'site([0-9]+)', 1) AS INT) % 3 = 1
                           THEN 2.0 ELSE 1.0 END, 6)::DOUBLE AS eta_s
            FROM ranked WHERE rank <= 5
        """,
        # URL features recomputed with DuckDB's OWN string functions over
        # the same constructed url — independent implementation
        "url_features": """
            WITH u AS (
                SELECT doc_id,
                       'https://'
                       || CASE WHEN doc_id % 3 = 0 THEN 'my-spam-'
                               ELSE 's' END
                       || 'site' || (doc_id % 13) || '.example'
                       || CASE WHEN doc_id % 4 = 0
                               THEN '/a/b' || doc_id ELSE '/p' END
                       || '/page' || doc_id || '.html'
                       || CASE WHEN doc_id % 5 = 0
                               THEN '?x=1&utm_source=9&y=22' ELSE '' END
                           AS url
                FROM documents),
            parts AS (
                SELECT doc_id, url,
                       regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS host,
                       regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                       regexp_extract(url, '\\?([^#]*)', 1) AS query
                FROM u)
            SELECT doc_id,
                   length(url)::INT AS url_len,
                   length(host)::INT AS host_len,
                   (length(host) - length(replace(host, '-', '')))::INT
                       AS host_hyphens,
                   (length(path) - length(replace(path, '/', '')))::INT
                       AS path_depth,
                   (length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))::INT
                       AS n_digits,
                   ROUND((length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))
                         / length(url)::DOUBLE, 6)::DOUBLE AS digit_ratio,
                   CASE WHEN query = '' THEN 0
                        ELSE length(query) - length(replace(query, '&', '')) + 1
                        END::INT AS n_params
            FROM parts
        """,
        "term_postings": """
            SELECT term, doc_id, count(*)::INT AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text),
                                                   '[a-zà-öø-ÿ]+')) AS term
                  FROM documents)
            GROUP BY term, doc_id
        """,
        "bm25_topk": """
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
                GROUP BY h.doc_id)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 25
        """,
        "tfidf_weights": """
            WITH postings AS (
                SELECT term, doc_id, count(*)::INT AS tf
                FROM (SELECT doc_id,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS term
                      FROM documents)
                GROUP BY term, doc_id),
            dfreq AS (
                SELECT term, count(*)::INT AS df FROM postings GROUP BY term),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT p.term, p.doc_id, p.tf, d.df,
                   ROUND((1.0 + ln(p.tf::DOUBLE))
                         * ln((1.0 + n.n_docs) / (1.0 + d.df)),
                         6)::DOUBLE AS tfidf
            FROM postings p JOIN dfreq d USING (term) CROSS JOIN n
        """,
        "phrase_search": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 120)
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' spark window merge end'
                               WHEN doc_id % 5 = 1 THEN ' spark window only'
                               ELSE ' filler' END AS text
                FROM documents)
            SELECT doc_id FROM s
            WHERE regexp_matches(lower(text),
                '(^|[^a-zà-öø-ÿ])spark[^a-zà-öø-ÿ]+window[^a-zà-öø-ÿ]+merge([^a-zà-öø-ÿ]|$)')
        """,
        "keyword_snippets": """
            SELECT doc_id,
                   NULLIF(regexp_extract(lower(text),
                       '(?s).{0,25}(?:^|[^a-zà-öø-ÿ])merge(?:[^a-zà-öø-ÿ]|$).{0,25}',
                       0), '') AS snippet
            FROM documents
        """,
        "dedup_cluster_sizes": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT size, count(*)::BIGINT AS n_clusters FROM (
                    SELECT component, count(*)::BIGINT AS size FROM (
                        WITH RECURSIVE und AS (
                            SELECT id_a AS a, id_b AS b FROM truepairs
                            UNION
                            SELECT id_b AS a, id_a AS b FROM truepairs),
                        reach(a, b) AS (
                            SELECT a, b FROM und
                            UNION
                            SELECT r.a, u.b FROM reach r
                            JOIN und u ON r.b = u.a),
                        comp AS (
                            SELECT a AS doc_id, least(a, min(b)) AS component
                            FROM reach GROUP BY a)
                        SELECT c.doc_id,
                               coalesce(comp.component, c.doc_id) AS component
                        FROM corpus c LEFT JOIN comp ON comp.doc_id = c.doc_id)
                    GROUP BY component)
                GROUP BY size
            """,
        ),
        "boolean_search": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents)
            SELECT doc_id FROM t
            WHERE list_contains(ws, 'spark')
              AND list_contains(ws, 'window')
              AND NOT list_contains(ws, 'slow')
        """,
        "update_postings": """
            WITH src AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id % 2 = 0 AND doc_id % 4 != 0
                UNION ALL
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id, substr(text, 1, 100) FROM documents
                WHERE doc_id % 4 = 0)
            SELECT term, doc_id, count(*)::INT AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text),
                                                   '[a-zà-öø-ÿ]+')) AS term
                  FROM src)
            GROUP BY term, doc_id
        """,
        "script_ratios": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 30)
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' привет мир здравствуй'
                               WHEN doc_id % 4 = 1 THEN ' γειά σου κόσμε'
                               WHEN doc_id % 4 = 2 THEN ' 你好世界再见'
                               ELSE ' plain' END
                       || CASE WHEN doc_id % 8 = 2
                               THEN ' 漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字'
                               ELSE '' END AS text
                FROM documents),
            c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ]'))::INT AS n_latin,
                       len(regexp_extract_all(text, '[Ѐ-ӿ]'))::INT AS n_cyrillic,
                       len(regexp_extract_all(text, '[Ͱ-Ͽ]'))::INT AS n_greek,
                       len(regexp_extract_all(text, '[一-鿿]'))::INT AS n_cjk
                FROM s)
            SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk,
                   CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk > 0
                        THEN ROUND(n_latin
                             / (n_latin + n_cyrillic + n_greek + n_cjk)::DOUBLE,
                             6)
                        END::DOUBLE AS latin_ratio,
                   CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk = 0
                        THEN NULL
                        WHEN n_latin >= greatest(n_cyrillic, n_greek, n_cjk)
                        THEN 'latin'
                        WHEN n_cyrillic >= greatest(n_greek, n_cjk)
                        THEN 'cyrillic'
                        WHEN n_greek >= n_cjk THEN 'greek'
                        ELSE 'cjk' END AS dominant_script
            FROM c
        """,
        "event_hourly": """
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                       AS bucket_epoch,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   ROUND(sum(value), 4)::DOUBLE AS sum_value,
                   ROUND(avg(value), 4)::DOUBLE AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "bigram_pmi": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            uni AS (
                SELECT w, count(*) AS c
                FROM (SELECT unnest(ws) AS w FROM toks)
                GROUP BY w),
            tt AS (SELECT sum(c) AS t_total FROM uni),
            bg AS (
                SELECT u.w1, u.w2 FROM (SELECT ws FROM toks),
                UNNEST(list_transform(generate_series(1, len(ws) - 1),
                                      j -> {'w1': ws[j], 'w2': ws[j + 1]}))
                    AS t(u)),
            big AS (
                SELECT w1, w2, count(*) AS c_ab
                FROM bg GROUP BY w1, w2
                HAVING count(*) >= 5),
            bt AS (
                SELECT sum(greatest(len(ws) - 1, 0)) AS b_total FROM toks)
            SELECT b.w1, b.w2, b.c_ab::BIGINT AS c_ab,
                   ROUND(ln(((b.c_ab / bt.b_total)
                             * (tt.t_total / ua.c))
                            * (tt.t_total / ub.c)), 6)::DOUBLE AS pmi
            FROM big b
            JOIN uni ua ON ua.w = b.w1
            JOIN uni ub ON ub.w = b.w2, tt, bt
        """,
        "top_terms": """
            WITH counts AS (
                SELECT lang, w AS term, count(*)::BIGINT AS n
                FROM (SELECT lang,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS w
                      FROM documents)
                GROUP BY lang, w)
            SELECT lang, term, n, rank::INT AS rank FROM (
                SELECT lang, term, n,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n DESC, term) AS rank
                FROM counts)
            WHERE rank <= 5
        """,
        "compression_ratio": _compression_oracle(),
        "cdc_chunks": _cdc_oracle(),
        "snapshot_delta": _snapshot_delta_oracle(),
        "cdc_incremental": _cdc_incremental_oracle(),
        "delta_chain": _delta_chain_oracle(),
        "recrawl_drift": _recrawl_drift_oracle(),
        # same quantized OLS: nano logs as HUGEINT, mirrored formula order
        "crawl_cadence": """
            WITH pages AS (
                SELECT 'https://sub' || (doc_id % 3) || '.site'
                       || (doc_id % 7) || '.example/p' || doc_id AS url,
                       'site' || (doc_id % 7) || '.example' AS domain,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            g AS (
                SELECT domain,
                       epoch - lag(epoch) OVER (
                           PARTITION BY domain ORDER BY epoch, url) AS gap
                FROM pages),
            a AS (
                SELECT domain, count(*) AS n_fetches, count(gap) AS n_gaps,
                       sum(gap) AS sum_gap, sum(gap * gap) AS sum_gap2,
                       quantile_cont(gap, 0.5) AS med
                FROM g GROUP BY domain)
            SELECT domain, n_fetches,
                   round(sum_gap::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
                   round(med::DOUBLE, 6) AS median_gap_s,
                   CASE WHEN n_gaps > 1 THEN
                       round((n_gaps::DOUBLE * sum_gap2::DOUBLE
                              - sum_gap::DOUBLE * sum_gap::DOUBLE)
                             / (n_gaps::DOUBLE * (n_gaps::DOUBLE - 1.0)), 6)
                   END::DOUBLE AS var_gap_s
            FROM a WHERE n_fetches >= 2
        """,
        "cocitation_pairs": """
            WITH ol AS (
                SELECT DISTINCT url, dom FROM (
                    SELECT 'https://p' || doc_id || '.example/x' AS url,
                           'a' || (doc_id % 5) || '.example' AS dom
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'b' || (doc_id % 3) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'c' || (doc_id % 4) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           CASE WHEN doc_id % 2 = 0 THEN 'hub.example'
                            ELSE 'c' || (doc_id % 4) || '.example' END
                    FROM documents))
            SELECT x.dom AS domain_a, y.dom AS domain_b,
                   count(*) AS n_pages
            FROM ol x JOIN ol y ON x.url = y.url AND x.dom < y.dom
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "sentence_chunks": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 40) || '. '
                       || substr(text, 41, 60) || '! '
                       || substr(text, 101, 50)
                       || CASE WHEN doc_id % 3 = 0 THEN '? Short tail.'
                               ELSE '...' END AS text
                FROM documents),
            s AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               x -> trim(x)),
                           x -> x != '') AS sents
                FROM src),
            c AS (
                SELECT doc_id, sents,
                       unnest(generate_series(
                           0, ((len(sents) - 1) // 2)::BIGINT)) AS chunk_id
                FROM s WHERE len(sents) > 0)
            SELECT doc_id, chunk_id::INT AS chunk_id,
                   len(sents[chunk_id * 2 + 1 : chunk_id * 2 + 3])::INT
                       AS n_sents,
                   array_to_string(
                       sents[chunk_id * 2 + 1 : chunk_id * 2 + 3], ' ')
                       AS chunk_text
            FROM c
        """,
        "quality_percentiles": """
            SELECT doc_id, lang, n_chars AS score,
                   round(percent_rank() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id), 6)
                       + 0 AS pct,
                   ntile(4) OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id)::INT
                       AS bucket
            FROM documents
        """,
        "event_anomalies": """
            WITH h AS (
                SELECT event_type,
                       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                           AS bucket_epoch,
                       count(*) AS n_events
                FROM events GROUP BY 1, 2),
            m AS (
                SELECT event_type, count(*) AS k, sum(n_events) AS s1,
                       sum(n_events * n_events) AS s2
                FROM h GROUP BY 1),
            s AS (
                SELECT event_type,
                       s1::DOUBLE / k::DOUBLE AS mean,
                       sqrt((k::DOUBLE * s2::DOUBLE
                             - s1::DOUBLE * s1::DOUBLE)
                            / (k::DOUBLE * (k::DOUBLE - 1.0))) AS sd
                FROM m WHERE k > 1),
            z AS (
                SELECT h.event_type, h.bucket_epoch, h.n_events,
                       CASE WHEN s.sd > 0 THEN
                           round((h.n_events::DOUBLE - s.mean) / s.sd, 6)
                           + 0
                       ELSE 0.0 END AS z
                FROM h JOIN s USING (event_type))
            SELECT event_type, bucket_epoch, n_events, z,
                   (abs(z) > 2.0) AS is_burst
            FROM z
        """,
        "title_body_overlap": """
            WITH src AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 0 THEN ''
                            ELSE substr(text, 1, 25)
                                 || CASE WHEN doc_id % 4 = 0
                                         THEN ' zzqx' ELSE '' END
                                 || CASE WHEN doc_id % 4 = 1
                                         THEN ' vvwy qqkj' ELSE '' END
                       END AS title,
                       text
                FROM documents),
            tok AS (
                SELECT doc_id,
                       list_distinct(list_filter(regexp_extract_all(
                           lower(title), '[a-zà-öø-ÿ]+'),
                           x -> x != '')) AS t,
                       list_distinct(list_filter(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'),
                           x -> x != '')) AS b
                FROM src)
            SELECT doc_id,
                   len(t)::INT AS n_title_tokens,
                   len(list_filter(t, x -> list_contains(b, x)))::INT
                       AS n_overlap,
                   CASE WHEN len(t) > 0 THEN
                       round(len(list_filter(t, x -> list_contains(b, x)))
                             / len(t)::DOUBLE, 6)
                   END::DOUBLE AS overlap_ratio
            FROM tok
        """,
        "quote_density": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 60) || ' "'
                       || substr(text, 61, 20) || '" said.'
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' "Another quote."' ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' "unclosed' ELSE '' END AS text
                FROM documents),
            q AS (
                SELECT doc_id, length(text) AS n_len,
                       regexp_extract_all(text, '"[^"]*"') AS segs
                FROM src)
            SELECT doc_id,
                   len(segs)::INT AS n_quotes,
                   coalesce(list_sum(list_transform(
                       segs, x -> length(x) - 2)), 0)::BIGINT
                       AS quoted_chars,
                   CASE WHEN n_len > 0 THEN
                       round(coalesce(list_sum(list_transform(
                                 segs, x -> length(x) - 2)), 0)
                             / n_len::DOUBLE, 6)
                   END::DOUBLE AS quote_char_ratio
            FROM q
        """,
        "outlink_quality": """
            WITH ol AS (
                SELECT DISTINCT url, dom FROM (
                    SELECT 'https://p' || doc_id || '.example/x' AS url,
                           'a' || (doc_id % 5) || '.example' AS dom
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'b' || (doc_id % 3) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'c' || (doc_id % 4) || '.example'
                    FROM documents)),
            sc AS (
                SELECT DISTINCT * FROM (
                    SELECT 'a' || (doc_id % 5) || '.example' AS domain,
                           (doc_id % 5)::DOUBLE / 10.0 AS score
                    FROM documents
                    UNION ALL
                    SELECT 'b' || (doc_id % 3) || '.example',
                           (doc_id % 3)::DOUBLE * 0.2 + 0.05
                    FROM documents))
            SELECT ol.url,
                   count(*)::BIGINT AS n_outlinks,
                   count(sc.score)::BIGINT AS n_scored,
                   CASE WHEN count(sc.score) > 0 THEN
                       round(sum(sc.score)::DOUBLE
                             / count(sc.score)::DOUBLE, 6)
                   END::DOUBLE AS mean_score,
                   min(sc.score)::DOUBLE AS min_score
            FROM ol LEFT JOIN sc ON ol.dom = sc.domain
            GROUP BY ol.url
        """,
        "redirect_chains": """
            WITH RECURSIVE raw AS (
                SELECT 'u' || doc_id AS src,
                       'u' || (CASE WHEN doc_id % 10 <> 9 THEN doc_id + 1
                                    ELSE doc_id - 9 END) AS dst
                FROM documents
                WHERE doc_id % 10 <> 9
                   OR (doc_id % 10 = 9 AND (doc_id // 10) % 5 = 0)),
            e AS (SELECT src, min(dst) AS dst FROM raw GROUP BY src),
            r AS (
                SELECT src AS start, dst AS cur, 1 AS hops FROM e
                UNION ALL
                SELECT r.start, e.dst, r.hops + 1
                FROM r JOIN e ON r.cur = e.src
                WHERE r.hops < 16),
            last AS (
                SELECT start, cur, hops,
                       row_number() OVER (
                           PARTITION BY start ORDER BY hops DESC) AS rn
                FROM r)
            SELECT l.start AS src, l.cur AS final, l.hops::INT AS hops,
                   (e2.src IS NULL) AS resolved
            FROM last l LEFT JOIN e e2 ON l.cur = e2.src
            WHERE l.rn = 1
        """,
        "weighted_sample": """
            WITH cand AS (
                SELECT doc_id,
                       ((doc_id % 7) + 1)::DOUBLE AS weight,
                       round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                                     ::BIGINT + 1)::DOUBLE
                                / (1152921504606846976::DOUBLE + 1.0))
                             / ((doc_id % 7) + 1)::DOUBLE, 6) + 0
                           AS priority
                FROM documents),
            ranked AS (
                SELECT doc_id, weight, priority,
                       row_number() OVER (
                           ORDER BY priority DESC, doc_id ASC) AS rank
                FROM cand)
            SELECT doc_id, weight, priority, rank::INT AS rank
            FROM ranked WHERE rank <= 25
        """,
        "partition_skew": """
            WITH keyed AS (
                SELECT source || ':' ||
                       (CASE WHEN doc_id % 10 < 7 THEN 'hot'
                             ELSE (doc_id % 10)::VARCHAR END) AS skewkey
                FROM documents),
            per AS (
                SELECT ('0x' || substr(md5(skewkey), 1, 15))::BIGINT % 16
                           AS b,
                       count(*) AS n
                FROM keyed GROUP BY b),
            agg AS (
                SELECT count(*) AS k, sum(n) AS s1, sum(n * n) AS s2,
                       max(n) AS mx
                FROM per)
            SELECT 16 AS n_buckets,
                   s1::BIGINT AS n_rows,
                   (16 - k)::INT AS n_empty,
                   mx::BIGINT AS max_bucket_rows,
                   CASE WHEN s1 > 0 THEN
                       round(mx::DOUBLE / (s1::DOUBLE / 16.0), 6)
                   END::DOUBLE AS skew_ratio,
                   CASE WHEN s1 > 0 THEN
                       round(sqrt((16.0 * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                                  / (16.0 * 16.0))
                             / (s1::DOUBLE / 16.0), 6)
                   END::DOUBLE AS cv
            FROM agg
        """,
        "length_outliers": """
            WITH src AS (
                SELECT doc_id, lang,
                       (CASE WHEN doc_id % 97 = 0 THEN n_chars * 50
                             ELSE n_chars END)::DOUBLE AS v
                FROM documents),
            med AS (
                SELECT lang, quantile_cont(v, 0.5) AS m
                FROM src GROUP BY lang),
            mad AS (
                SELECT src.lang,
                       round(quantile_cont(abs(v - m), 0.5), 6) AS d
                FROM src JOIN med ON src.lang = med.lang
                GROUP BY src.lang),
            z AS (
                SELECT doc_id, src.lang, v,
                       CASE WHEN d > 0
                            THEN round((v - m) / d, 6) + 0 END AS robust_z
                FROM src
                JOIN med ON src.lang = med.lang
                JOIN mad ON src.lang = mad.lang)
            SELECT doc_id, lang, v::BIGINT AS n_chars, robust_z,
                   coalesce(abs(robust_z) > 3.0, FALSE) AS is_outlier
            FROM z
        """,
        "domain_triangles": """
            WITH raw AS (
                SELECT 'd' || (doc_id % 12) AS x,
                       'd' || ((doc_id % 12 + 1 + doc_id % 4) % 12) AS y
                FROM documents),
            e AS (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM raw WHERE x <> y),
            deg AS (
                SELECT node, count(*) AS d FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e)
                GROUP BY node),
            tri AS (
                SELECT count(*) AS t
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            stats AS (
                SELECT count(*) AS nn, sum((d * (d - 1)) // 2) AS w
                FROM deg),
            ne AS (SELECT count(*) AS m FROM e)
            SELECT nn::BIGINT AS n_nodes, m::BIGINT AS n_edges,
                   w::BIGINT AS n_wedges, t::BIGINT AS n_triangles,
                   CASE WHEN w > 0 THEN
                       round(3.0 * t::DOUBLE / w::DOUBLE, 6)
                   END::DOUBLE AS global_clustering
            FROM stats, ne, tri
        """,
        "range_enrich": """
            WITH vals AS (
                SELECT doc_id AS id, (doc_id * 37) % 1000 AS v
                FROM documents),
            r AS (
                SELECT DISTINCT * FROM (
                    SELECT (doc_id % 10) * 100 AS lo,
                           (doc_id % 10) * 100 + 49 AS hi,
                           'r' || (doc_id % 10) AS label
                    FROM documents
                    UNION ALL
                    SELECT 25, 125, 'wide' FROM documents)),
            j AS (
                SELECT vals.id, vals.v, r.label, r.lo,
                       row_number() OVER (
                           PARTITION BY vals.id
                           ORDER BY r.lo ASC NULLS LAST,
                                    r.label ASC NULLS LAST) AS rn
                FROM vals LEFT JOIN r ON vals.v BETWEEN r.lo AND r.hi)
            SELECT id, v, label AS range_label FROM j WHERE rn = 1
        """,
        "signal_correlations": """
            WITH s AS (
                SELECT round(n_chars::DOUBLE * 1e6)::HUGEINT AS x,
                       round(len(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE
                             * 1e6)::HUGEINT AS y,
                       round(7::DOUBLE * 1e6)::HUGEINT AS z
                FROM documents),
            a AS (
                SELECT count(*) AS k,
                       sum(x) AS sx, sum(x * x) AS sxx,
                       sum(y) AS sy, sum(y * y) AS syy,
                       sum(z) AS sz, sum(z * z) AS szz,
                       sum(x * y) AS sxy, sum(x * z) AS sxz,
                       sum(y * z) AS syz
                FROM s)
            SELECT 'n_chars' AS signal_a, 'n_words' AS signal_b,
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxy::DOUBLE
                              - sx::DOUBLE * sy::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * syy::DOUBLE
                                       - sy::DOUBLE * sy::DOUBLE)), 6)
                       + 0
                   END::DOUBLE AS r
            FROM a
            UNION ALL
            SELECT 'n_chars', 'n_const',
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxz::DOUBLE
                              - sx::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
            UNION ALL
            SELECT 'n_words', 'n_const',
                   CASE WHEN (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * syz::DOUBLE
                              - sy::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * syy::DOUBLE
                                     - sy::DOUBLE * sy::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
        """,
        # Spearman = the same exact-moment Pearson over DOUBLED
        # tie-averaged ranks (2*cnt_less + cnt_tied + 1, an exact
        # int64); ranks per signal from value-level counts + an
        # inclusive running sum, matching global_prefix_sums.
        "spearman_signals": """
            WITH s AS (
                SELECT round(n_chars::DOUBLE * 1e6)::HUGEINT AS x,
                       round(len(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE
                             * 1e6)::HUGEINT AS y,
                       round(7::DOUBLE * 1e6)::HUGEINT AS z
                FROM documents),
            vx AS (SELECT x AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            rx AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vx),
            vy AS (SELECT y AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            ry AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vy),
            vz AS (SELECT z AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            rz AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vz),
            rr AS (
                SELECT rx.r2 AS x, ry.r2 AS y, rz.r2 AS z
                FROM s
                JOIN rx ON s.x = rx.val
                JOIN ry ON s.y = ry.val
                JOIN rz ON s.z = rz.val),
            a AS (
                SELECT count(*) AS k,
                       sum(x) AS sx, sum(x * x) AS sxx,
                       sum(y) AS sy, sum(y * y) AS syy,
                       sum(z) AS sz, sum(z * z) AS szz,
                       sum(x * y) AS sxy, sum(x * z) AS sxz,
                       sum(y * z) AS syz
                FROM rr)
            SELECT 'n_chars' AS signal_a, 'n_words' AS signal_b,
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxy::DOUBLE
                              - sx::DOUBLE * sy::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * syy::DOUBLE
                                       - sy::DOUBLE * sy::DOUBLE)), 6)
                       + 0
                   END::DOUBLE AS r
            FROM a
            UNION ALL
            SELECT 'n_chars', 'n_const',
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxz::DOUBLE
                              - sx::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
            UNION ALL
            SELECT 'n_words', 'n_const',
                   CASE WHEN (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * syz::DOUBLE
                              - sy::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * syy::DOUBLE
                                     - sy::DOUBLE * sy::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
        """,
        "corpus_growth": """
            WITH per AS (
                SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                           AS bucket_epoch,
                       count(*) AS n
                FROM events GROUP BY 1)
            SELECT bucket_epoch,
                   n::BIGINT AS n_events,
                   sum(n) OVER (ORDER BY bucket_epoch
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)::BIGINT AS cum_events,
                   round(sum(n) OVER (ORDER BY bucket_epoch
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)::DOUBLE
                         / sum(n) OVER ()::DOUBLE, 6) AS pct_of_total
            FROM per
        """,
        "markup_signals": """
            WITH src AS (
                SELECT doc_id,
                       'm://' || doc_id AS url,
                       '<html><body>'
                       || repeat('<script src=x></script>',
                                 (doc_id % 4)::INT)
                       || repeat('<iframe>', (doc_id % 3)::INT)
                       || CASE WHEN doc_id % 5 = 0
                               THEN '<form action=/s>' ELSE '' END
                       || repeat('<a href=x>t</a>', (doc_id % 6)::INT)
                       || repeat('plain text ', (doc_id % 7)::INT + 1)
                       || '</body></html>' AS t
                FROM documents)
            SELECT url,
                   len(regexp_extract_all(t, '(?is)<script[\\s>]'))::INT
                       AS n_script,
                   len(regexp_extract_all(t, '(?is)<iframe[\\s>]'))::INT
                       AS n_iframe,
                   len(regexp_extract_all(t, '(?is)<form[\\s>]'))::INT
                       AS n_form,
                   len(regexp_extract_all(t, '(?is)<a[\\s>]'))::INT
                       AS n_links,
                   CASE WHEN length(t) > 0 THEN
                       round(len(regexp_extract_all(t, '<[a-zA-Z]'))::DOUBLE
                             * 100.0 / length(t)::DOUBLE, 6)
                   END::DOUBLE AS tag_density
            FROM src
        """,
        "meta_redirects": """
            SELECT 'r://' || doc_id AS url,
                   CASE doc_id % 5
                        WHEN 0 THEN 5 WHEN 1 THEN 0
                        WHEN 2 THEN 30 ELSE 1 END AS delay_s,
                   CASE doc_id % 5
                        WHEN 0 THEN 'https://t.example/a' || doc_id
                        WHEN 1 THEN '/next' || doc_id
                        WHEN 2 THEN NULL
                        ELSE 'first' || doc_id END AS target
            FROM documents
            WHERE doc_id % 5 <> 3
        """,
        "rel_pagination": """
            SELECT 'g://' || doc_id AS url,
                   CASE doc_id % 4
                        WHEN 0 THEN 'https://s.example/p' || (doc_id + 1)
                        WHEN 2 THEN '/n' || doc_id
                        ELSE NULL END AS next_url,
                   CASE doc_id % 4
                        WHEN 1 THEN '/p' || (doc_id - 1)
                        WHEN 2 THEN '/p' || doc_id
                        ELSE NULL END AS prev_url,
                   (doc_id % 4) IN (0, 1, 2) AS is_paginated
            FROM documents
        """,
        "og_cards": """
            SELECT 'o://' || doc_id AS url,
                   CASE doc_id % 4
                        WHEN 0 THEN 'First ' || doc_id
                        WHEN 1 THEN 'Title ' || doc_id || ' here'
                        ELSE NULL END AS og_title,
                   CASE WHEN doc_id % 4 = 0 THEN 'article' END AS og_type,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'https://img.example/' || doc_id || '.jpg'
                   END AS og_image,
                   CASE doc_id % 4
                        WHEN 0 THEN 'summary_large_image'
                        WHEN 2 THEN 'summary'
                        ELSE NULL END AS twitter_card
            FROM documents
        """,
        "k_core": """
            SELECT DISTINCT 'c' || (doc_id % 20) AS node, 4::BIGINT AS deg
            FROM documents
        """,
        "client_redirect_chains": """
            WITH RECURSIVE raw AS (
                SELECT 'u' || doc_id AS src,
                       'u' || (CASE WHEN doc_id % 10 <> 9 THEN doc_id + 1
                                    ELSE doc_id - 9 END) AS dst
                FROM documents
                WHERE doc_id % 10 <> 9
                   OR (doc_id % 10 = 9 AND (doc_id // 10) % 5 = 0)),
            e AS (SELECT src, min(dst) AS dst FROM raw GROUP BY src),
            r AS (
                SELECT src AS start, dst AS cur, 1 AS hops FROM e
                UNION ALL
                SELECT r.start, e.dst, r.hops + 1
                FROM r JOIN e ON r.cur = e.src
                WHERE r.hops < 16),
            last AS (
                SELECT start, cur, hops,
                       row_number() OVER (
                           PARTITION BY start ORDER BY hops DESC) AS rn
                FROM r)
            SELECT l.start AS src, l.cur AS final, l.hops::INT AS hops,
                   (e2.src IS NULL) AS resolved
            FROM last l LEFT JOIN e e2 ON l.cur = e2.src
            WHERE l.rn = 1
        """,
        "cluster_pair_eval": """
            WITH a AS (
                SELECT ((doc_id + CASE WHEN doc_id % 11 = 0
                                       THEN 1 ELSE 0 END) % 6) AS pred,
                       (doc_id % 6) AS truth
                FROM documents),
            tp AS (
                SELECT sum((n * (n - 1)) // 2) AS tp_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY pred, truth)),
            pp AS (
                SELECT sum((n * (n - 1)) // 2) AS pred_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY pred)),
            tt AS (
                SELECT sum((n * (n - 1)) // 2) AS true_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY truth)),
            nn AS (SELECT count(*) AS n_items FROM a),
            j AS (SELECT * FROM nn, tp, pp, tt),
            pr AS (
                SELECT *,
                       CASE WHEN pred_pairs > 0 THEN
                           round(tp_pairs::DOUBLE / pred_pairs::DOUBLE, 6)
                       END AS precision,
                       CASE WHEN true_pairs > 0 THEN
                           round(tp_pairs::DOUBLE / true_pairs::DOUBLE, 6)
                       END AS recall
                FROM j)
            SELECT n_items::BIGINT AS n_items, tp_pairs::BIGINT AS tp_pairs,
                   pred_pairs::BIGINT AS pred_pairs,
                   true_pairs::BIGINT AS true_pairs,
                   precision::DOUBLE AS precision, recall::DOUBLE AS recall,
                   (CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                         THEN CASE WHEN precision + recall > 0
                                   THEN round(2.0 * precision * recall
                                              / (precision + recall), 6)
                                   ELSE 0.0 END
                    END)::DOUBLE AS f1
            FROM pr
        """,
        "rater_kappa_pairs": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'r' || r::VARCHAR AS rater,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            pairs AS (
                SELECT a.rater AS rater_a, b.rater AS rater_b,
                       a.label AS la, b.label AS lb
                FROM ratings a
                JOIN ratings b
                  ON a.item_id = b.item_id AND a.rater < b.rater),
            tot AS (
                SELECT rater_a, rater_b, count(*) AS n,
                       sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
                FROM pairs GROUP BY 1, 2),
            al AS (SELECT rater_a, rater_b, la AS l, count(*) AS a_l
                   FROM pairs GROUP BY 1, 2, 3),
            bl AS (SELECT rater_a, rater_b, lb AS l, count(*) AS b_l
                   FROM pairs GROUP BY 1, 2, 3),
            ch AS (
                SELECT coalesce(al.rater_a, bl.rater_a) AS rater_a,
                       coalesce(al.rater_b, bl.rater_b) AS rater_b,
                       sum(coalesce(a_l, 0) * coalesce(b_l, 0)) AS sum_ab
                FROM al FULL JOIN bl
                  ON al.rater_a = bl.rater_a AND al.rater_b = bl.rater_b
                     AND al.l = bl.l
                GROUP BY 1, 2)
            SELECT t.rater_a, t.rater_b,
                   n::BIGINT AS n_items, agree::BIGINT AS n_agree,
                   round(agree::DOUBLE / n::DOUBLE, 6) AS po,
                   round(sum_ab::DOUBLE / (n * n)::DOUBLE, 6) AS pe,
                   (CASE WHEN n * n - sum_ab != 0 THEN
                        round((n * agree - sum_ab)::DOUBLE
                              / (n * n - sum_ab)::DOUBLE, 6)
                    END)::DOUBLE AS kappa
            FROM tot t JOIN ch USING (rater_a, rater_b)
        """,
        "fleiss_kappa": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            cell AS (SELECT item_id, label, count(*) AS n_il
                     FROM ratings GROUP BY 1, 2),
            item AS (SELECT item_id, sum(n_il) AS n_i,
                            sum(n_il * n_il) AS sum_sq
                     FROM cell GROUP BY 1 HAVING sum(n_il) >= 2),
            ag AS (SELECT count(*) AS n_items,
                          sum(((sum_sq - n_i) * 1000000000)
                              // (n_i * (n_i - 1))) AS sum_p_nano,
                          sum(n_i) AS n_ratings
                   FROM item),
            lab AS (SELECT sum(c_j * c_j) AS sum_cj_sq FROM (
                        SELECT sum(n_il) AS c_j
                        FROM cell JOIN item USING (item_id)
                        GROUP BY label)),
            j AS (SELECT *,
                         sum_p_nano::DOUBLE / (n_items::DOUBLE * 1e9)
                             AS p_bar_raw,
                         sum_cj_sq::DOUBLE / (n_ratings * n_ratings)::DOUBLE
                             AS p_e_raw
                  FROM ag, lab)
            SELECT n_items::BIGINT AS n_items, n_ratings::BIGINT AS n_ratings,
                   round(p_bar_raw, 6) AS p_bar,
                   round(p_e_raw, 6) AS p_e,
                   (CASE WHEN round(p_e_raw, 9) != 1.0 THEN
                        round((p_bar_raw - p_e_raw) / (1.0 - p_e_raw), 6)
                    END)::DOUBLE AS kappa
            FROM j
        """,
        "negative_sampling": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS word
                FROM documents),
            counts AS (SELECT word, count(*) AS n FROM toks GROUP BY 1),
            vocab AS (SELECT word, n FROM counts
                      ORDER BY n DESC, word LIMIT 200),
            w AS (SELECT word, n::BIGINT AS n,
                         floor(1e6 * sqrt(sqrt((n::HUGEINT * n * n)::DOUBLE)))::BIGINT
                             AS w_micro
                  FROM vocab),
            t AS (SELECT sum(w_micro) AS total FROM w),
            b AS (SELECT word, n, w_micro,
                         (5000 * w_micro) // total AS base,
                         (5000 * w_micro) % total AS rem
                  FROM w, t),
            l AS (SELECT 5000 - sum(base) AS leftover FROM b),
            r AS (SELECT *, row_number() OVER (
                                ORDER BY rem DESC, word ASC) AS rk
                  FROM b)
            SELECT word, n, w_micro,
                   (base + CASE WHEN rk <= (SELECT leftover FROM l)
                                THEN 1 ELSE 0 END)::BIGINT AS slots
            FROM r
        """,
        "burrows_delta": """
            WITH toks AS (
                SELECT lang AS g,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS w
                FROM documents),
            counts AS (SELECT g, w, count(*) AS n FROM toks GROUP BY 1, 2),
            totals AS (SELECT g, sum(n) AS total FROM counts GROUP BY 1),
            groups AS (SELECT g, total FROM totals WHERE total > 0
                       ORDER BY total DESC, g LIMIT 5),
            ic AS (SELECT c.g, c.w, c.n FROM counts c JOIN groups USING (g)),
            words AS (SELECT w FROM (
                          SELECT w, sum(n) AS wn FROM ic GROUP BY w)
                      ORDER BY wn DESC, w LIMIT 40),
            dense AS (
                SELECT gw.g, gw.w,
                       (coalesce(ic.n, 0) * 1000000000) // gw.total AS f
                FROM (SELECT groups.g, groups.total, words.w
                      FROM groups CROSS JOIN words) gw
                LEFT JOIN ic ON ic.g = gw.g AND ic.w = gw.w),
            stats AS (SELECT w, count(*) AS gn, sum(f) AS sum_f,
                             sum(f * f) AS sum_f2
                      FROM dense GROUP BY w),
            z AS (SELECT g, w, (f * gn - sum_f) AS num,
                         sqrt((gn * sum_f2 - sum_f * sum_f)::DOUBLE) AS den
                  FROM dense JOIN stats USING (w)),
            pt AS (SELECT a.g AS group_a, b.g AS group_b, a.den AS den,
                          CASE WHEN a.den > 0 THEN
                              floor(1e6 * abs((a.num - b.num)::DOUBLE)
                                    / a.den)
                          END AS term_micro
                   FROM z a JOIN z b ON a.w = b.w AND a.g < b.g),
            agg AS (SELECT group_a, group_b,
                           sum(CASE WHEN den > 0 THEN 1 ELSE 0 END)
                               AS n_words,
                           sum(term_micro) AS sum_micro
                    FROM pt GROUP BY 1, 2)
            SELECT group_a, group_b, n_words::BIGINT AS n_words,
                   (CASE WHEN n_words > 0 THEN
                        round(sum_micro::DOUBLE
                              / (n_words::DOUBLE * 1e6), 6)
                    END)::DOUBLE AS delta
            FROM agg
        """,
        "krippendorff_alpha": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            cell AS (SELECT item_id, label, count(*) AS n_il
                     FROM ratings GROUP BY 1, 2),
            item AS (SELECT item_id, sum(n_il) AS n_i,
                            sum(n_il * n_il) AS sum_sq
                     FROM cell GROUP BY 1 HAVING sum(n_il) >= 2),
            ag AS (SELECT count(*) AS n_items,
                          sum(((n_i * n_i - sum_sq) * 1000000000)
                              // (n_i - 1)) AS sum_d_nano,
                          sum(n_i) AS n_ratings
                   FROM item),
            lab AS (SELECT sum(c_j * c_j) AS sum_cj_sq FROM (
                        SELECT sum(n_il) AS c_j
                        FROM cell JOIN item USING (item_id)
                        GROUP BY label)),
            j AS (SELECT *,
                         sum_d_nano::DOUBLE / (n_ratings::DOUBLE * 1e9)
                             AS d_o_raw,
                         (n_ratings * n_ratings - sum_cj_sq)::DOUBLE
                             / (n_ratings * (n_ratings - 1))::DOUBLE
                             AS d_e_raw
                  FROM ag, lab)
            SELECT n_items::BIGINT AS n_items, n_ratings::BIGINT AS n_ratings,
                   round(d_o_raw, 6) AS d_o,
                   round(d_e_raw, 6) AS d_e,
                   (CASE WHEN d_e_raw > 0 THEN
                        round(1.0 - d_o_raw / d_e_raw, 6)
                    END)::DOUBLE AS alpha
            FROM j
        """,
        "rank_agreement": """
            WITH s AS (
                SELECT doc_id, n_chars AS score_a,
                       n_chars + (doc_id % 13) * 7 - 42 AS score_b
                FROM documents),
            r AS (
                SELECT row_number() OVER (
                           ORDER BY score_a ASC, doc_id ASC) AS ra,
                       row_number() OVER (
                           ORDER BY score_b ASC, doc_id ASC) AS rb
                FROM s),
            a AS (
                SELECT count(*) AS n,
                       sum((ra - rb) * (ra - rb)) AS sum_d2
                FROM r)
            SELECT n::BIGINT AS n, sum_d2::BIGINT AS sum_d2,
                   (CASE WHEN n > 1 THEN
                       round(1.0 - 6.0 * sum_d2::DOUBLE
                             / (n::DOUBLE * (n::DOUBLE * n::DOUBLE - 1.0)),
                             6) + 0
                   END)::DOUBLE AS rho
            FROM a
        """,
        "score_drift_ks": """
            WITH tagged AS (
                SELECT n_chars AS v, 1 AS ia, 0 AS ib
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL
                SELECT n_chars + (doc_id % 5) * 3, 0, 1
                FROM documents WHERE doc_id % 2 = 1),
            per AS (
                SELECT v, sum(ia) AS ca, sum(ib) AS cb
                FROM tagged GROUP BY v),
            curve AS (
                SELECT v,
                       sum(ca) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_a,
                       sum(cb) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_b,
                       sum(ca) OVER () AS n_a,
                       sum(cb) OVER () AS n_b
                FROM per),
            gaps AS (
                SELECT v, n_a, n_b,
                       round(abs(cum_a::DOUBLE / n_a::DOUBLE
                                 - cum_b::DOUBLE / n_b::DOUBLE), 6) AS gap
                FROM curve),
            best AS (
                SELECT *, row_number() OVER (
                           ORDER BY gap DESC, v ASC) AS rn
                FROM gaps)
            SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   gap::DOUBLE AS d_stat, v AS at_value
            FROM best WHERE rn = 1
        """,
        "retrieval_eval": """
            WITH run AS (
                SELECT doc_id % 5 AS qid, doc_id,
                       (doc_id // 5) + 1 AS rank FROM documents),
            rel AS (
                SELECT DISTINCT doc_id % 5 AS qid, doc_id
                FROM documents WHERE doc_id % 3 = 0),
            marked AS (
                SELECT r.qid, r.rank,
                       (rl.doc_id IS NOT NULL) AS isrel
                FROM run r LEFT JOIN rel rl
                  ON r.qid = rl.qid AND r.doc_id = rl.doc_id),
            per AS (
                SELECT qid,
                       count(*) FILTER (WHERE isrel AND rank <= 10)
                           AS hits_k,
                       min(CASE WHEN isrel THEN rank END) AS first_rel,
                       sum(CASE WHEN isrel AND rank <= 10
                                THEN round(1e9 / log2(rank::DOUBLE + 1.0))
                                     ::BIGINT
                                ELSE 0 END) AS dcg_nano
                FROM marked GROUP BY qid),
            nr AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
            j AS (
                SELECT nr.qid, nr.n_rel,
                       coalesce(per.hits_k, 0) AS hits_k,
                       per.first_rel,
                       coalesce(per.dcg_nano, 0) AS dcg_nano,
                       list_sum(list_transform(
                           generate_series(1, least(nr.n_rel, 10)::BIGINT),
                           r -> round(1e9 / log2(r::DOUBLE + 1.0))::BIGINT))
                           AS ideal_nano
                FROM nr LEFT JOIN per ON nr.qid = per.qid)
            SELECT qid, n_rel::BIGINT AS n_rel, hits_k::BIGINT AS hits_k,
                   round(hits_k::DOUBLE / 10.0, 6) AS p_at_k,
                   round(hits_k::DOUBLE / n_rel::DOUBLE, 6) AS r_at_k,
                   round(coalesce(1.0 / first_rel::DOUBLE, 0.0), 6) AS rr,
                   round(dcg_nano::DOUBLE / ideal_nano::DOUBLE, 6)
                       AS ndcg_k
            FROM j
        """,
        "event_transitions": """
            WITH seq AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_type
                FROM events),
            pairs AS (
                SELECT prev_type, event_type, count(*) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY prev_type, event_type)
            SELECT prev_type, event_type, n::BIGINT AS n,
                   round(n::DOUBLE
                         / sum(n) OVER (PARTITION BY prev_type)::DOUBLE,
                         6) AS prob
            FROM pairs
        """,
        "template_fingerprints": """
            SELECT 't://' || doc_id AS url,
                   CASE doc_id % 3
                        WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 0 END
                       AS n_class_tokens,
                   CASE doc_id % 3
                        WHEN 0 THEN md5('body|main|nav|text')
                        WHEN 1 THEN md5('main|nav')
                        ELSE NULL END AS fingerprint
            FROM documents
        """,
        "allocate_budget": """
            WITH c AS (
                SELECT lang || ':' || (doc_id % 3) AS stratum,
                       count(*) AS n
                FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS total FROM c),
            q AS (
                SELECT stratum, n,
                       (1000 * n) // total AS base,
                       (1000 * n) % total AS rem
                FROM c, t),
            l AS (SELECT 1000 - sum(base) AS leftover FROM q),
            r AS (
                SELECT *, row_number() OVER (
                           ORDER BY rem DESC, stratum ASC) AS rk
                FROM q)
            SELECT stratum, n::BIGINT AS n,
                   (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                       ::BIGINT AS alloc
            FROM r, l
        """,
        "temporal_splits": """
            WITH s AS (
                SELECT doc_id,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            c AS (
                SELECT round(quantile_cont(epoch, 0.8), 6) AS b1,
                       round(quantile_cont(epoch, 0.9), 6) AS b2
                FROM s)
            SELECT doc_id, epoch,
                   CASE WHEN epoch::DOUBLE < b1 THEN 'train'
                        WHEN epoch::DOUBLE < b2 THEN 'val'
                        ELSE 'test' END AS split
            FROM s, c
        """,
        "politeness_audit": """
            WITH pages AS (
                SELECT 'https://sub' || (doc_id % 3) || '.site'
                       || (doc_id % 7) || '.example/p' || doc_id AS url,
                       'site' || (doc_id % 7) || '.example' AS domain,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            g AS (
                SELECT domain,
                       epoch - lag(epoch) OVER (
                           PARTITION BY domain ORDER BY epoch, url) AS gap
                FROM pages),
            a AS (
                SELECT domain, count(*) AS n_fetches, count(gap) AS n_gaps,
                       sum(gap) AS sum_gap
                FROM g GROUP BY domain),
            cad AS (
                SELECT domain, n_fetches,
                       round(sum_gap::DOUBLE / n_gaps::DOUBLE, 6)
                           AS mean_gap_s
                FROM a WHERE n_fetches >= 2),
            delays AS (
                SELECT DISTINCT 'site' || (doc_id % 7) || '.example'
                           AS domain,
                       ((doc_id % 7) % 4) * 1000 + 500 AS crawl_delay_s
                FROM documents)
            SELECT cad.domain, cad.n_fetches, cad.mean_gap_s,
                   delays.crawl_delay_s::BIGINT AS crawl_delay_s,
                   (cad.mean_gap_s < delays.crawl_delay_s::DOUBLE)
                       AS violates
            FROM cad JOIN delays ON cad.domain = delays.domain
        """,
        "compaction_plan": """
            WITH files AS (
                SELECT 'f' || doc_id || '.parquet' AS path,
                       (doc_id * 131) % 10000 + 100 AS bytes
                FROM documents)
            SELECT path, bytes::BIGINT AS bytes,
                   ((sum(bytes) OVER (
                         ORDER BY bytes DESC, path ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - bytes) // 16384)::INT AS bin
            FROM files
        """,
        "dom_depth": """
            SELECT 'd://' || doc_id AS url,
                   CASE doc_id % 4 WHEN 0 THEN 6 WHEN 1 THEN 7
                        WHEN 2 THEN 2 ELSE 5 END AS n_tags,
                   CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2
                        WHEN 2 THEN 0 ELSE 2 END AS max_depth
            FROM documents
        """,
        "url_lifespan": """
            WITH o AS (
                SELECT 'u' || (doc_id % 100) AS url,
                       86400 * (doc_id % 7) AS snap
                FROM documents)
            SELECT url, min(snap)::BIGINT AS first_seen,
                   max(snap)::BIGINT AS last_seen,
                   count(DISTINCT snap)::BIGINT AS n_snapshots,
                   (max(snap) = (SELECT max(snap) FROM o)) AS is_active
            FROM o GROUP BY url
        """,
        "latency_bands": """
            SELECT event_type,
                   count(value)::BIGINT AS n,
                   round(quantile_cont(value, 0.5)::DOUBLE, 6) AS p50,
                   round(quantile_cont(value, 0.95)::DOUBLE, 6) AS p95,
                   CASE WHEN count(value) > 0 THEN
                       round(sum(value::DOUBLE)
                             / count(value)::DOUBLE, 6)
                   END::DOUBLE AS mean_value
            FROM events GROUP BY event_type
        """,
        "interleave_strata": """
            WITH s AS (SELECT doc_id, lang AS stratum FROM documents),
            idx AS (
                SELECT stratum,
                       row_number() OVER (ORDER BY stratum) - 1 AS i
                FROM (SELECT DISTINCT stratum FROM s)),
            k AS (SELECT count(*) AS k FROM idx),
            r AS (
                SELECT doc_id, stratum,
                       row_number() OVER (
                           PARTITION BY stratum ORDER BY doc_id) AS rn
                FROM s)
            SELECT r.doc_id, r.stratum, rn::BIGINT AS stratum_rank,
                   ((rn - 1) * k + i)::BIGINT AS train_order
            FROM r JOIN idx USING (stratum) CROSS JOIN k
        """,
        "punct_profile": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 50)
                       || CASE doc_id % 3
                            WHEN 0 THEN ' “quoted” — and… more”'
                            WHEN 1 THEN ' "ascii" -- and... more'
                            ELSE ' bare words only' END AS text
                FROM documents),
            c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[“”‘’—…]')) AS ns,
                       len(regexp_extract_all(text, '["'']'))
                       + len(regexp_extract_all(text, '--'))
                       + len(regexp_extract_all(text, '\\.\\.\\.')) AS na
                FROM src)
            SELECT doc_id, ns::INT AS n_smart, na::INT AS n_ascii,
                   CASE WHEN ns + na > 0 THEN
                       round(ns::DOUBLE / (ns + na)::DOUBLE, 6)
                   END::DOUBLE AS smart_ratio
            FROM c
        """,
        "json_props": """
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        WHEN event_id % 7 = 1 THEN NULL
                        ELSE json_extract_string(props, '$.k')::INT
                   END AS k,
                   (event_id % 7 <> 0) AS is_valid
            FROM events
        """,
        # Variant construction replay: every field is arithmetic on
        # event_id; the valid-row variant schema is the construction-
        # known literal Spark's schema_of_variant emits.
        "variant_props": """
            SELECT event_id,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE event_id % 100 END::BIGINT AS k,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'l' || CAST(event_id % 5 AS VARCHAR)
                   END AS lang,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE event_id % 7 END::BIGINT AS score,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'x' END AS tag1,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'OBJECT<k: BIGINT, meta: OBJECT<lang: STRING, '
                             || 'score: BIGINT>, tags: ARRAY<STRING>>'
                   END AS variant_schema,
                   (event_id % 11 = 0) AS corrupt
            FROM events
        """,
        "count_cusum": """
            WITH per AS (
                SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                           AS day,
                       count(*) AS c
                FROM events GROUP BY 1),
            curve AS (
                SELECT day,
                       row_number() OVER (ORDER BY day) AS i,
                       sum(c) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
                       sum(c) OVER () AS total,
                       count(*) OVER () AS n
                FROM per),
            s AS (
                SELECT day, total, n,
                       n * cum - i * total AS s
                FROM curve),
            best AS (
                SELECT *, row_number() OVER (
                           ORDER BY abs(s) DESC, day ASC) AS rn
                FROM s)
            SELECT n::BIGINT AS n_days, total::BIGINT AS total_events,
                   day AS peak_day, s::BIGINT AS peak_stat,
                   CASE WHEN total > 0 THEN
                       round(abs(s)::DOUBLE / (n * total)::DOUBLE, 6)
                   END::DOUBLE AS norm_stat
            FROM best WHERE rn = 1
        """,
        "domain_churn": """
            WITH o AS (
                SELECT 'site' || (doc_id % 7) || '.example' AS domain,
                       count(*) AS n_old
                FROM documents GROUP BY 1),
            n AS (
                SELECT 'site' || ((doc_id % 7) + 2) || '.example' AS domain,
                       count(*) AS n_new
                FROM documents GROUP BY 1)
            SELECT coalesce(o.domain, n.domain) AS domain,
                   coalesce(n_old, 0)::BIGINT AS n_old,
                   coalesce(n_new, 0)::BIGINT AS n_new,
                   CASE WHEN o.domain IS NULL THEN 'new'
                        WHEN n.domain IS NULL THEN 'lost'
                        ELSE 'retained' END AS status
            FROM o FULL OUTER JOIN n ON o.domain = n.domain
        """,
        "threshold_for_rate": """
            WITH c AS (
                SELECT round(quantile_cont(n_chars, 0.7), 6) AS cutoff
                FROM documents),
            k AS (
                SELECT cutoff, count(*) AS n_total,
                       sum(CASE WHEN n_chars::DOUBLE >= cutoff
                                THEN 1 ELSE 0 END) AS n_kept
                FROM documents, c GROUP BY cutoff)
            SELECT cutoff::DOUBLE AS cutoff, n_total::BIGINT AS n_total,
                   n_kept::BIGINT AS n_kept,
                   CASE WHEN n_total > 0 THEN
                       round(n_kept::DOUBLE / n_total::DOUBLE, 6)
                   END::DOUBLE AS achieved_rate
            FROM k
        """,
        "hapax_stats": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_distinct(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))) AS tok
                FROM documents),
            dfreq AS (
                SELECT tok, count(*) AS df FROM toks GROUP BY tok),
            per AS (
                SELECT doc_id, count(*) AS nd,
                       sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS nh
                FROM toks JOIN dfreq USING (tok) GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(nd, 0)::INT AS n_distinct_tokens,
                   coalesce(nh, 0)::INT AS n_hapax,
                   CASE WHEN coalesce(nd, 0) > 0 THEN
                       round(nh::DOUBLE / nd::DOUBLE, 6)
                   END::DOUBLE AS hapax_ratio
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
    }
