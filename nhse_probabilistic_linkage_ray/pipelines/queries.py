"""Query catalog: name -> (ray callable, oracle SQL | None).

The driver contract (__ray_entry__.py) exposes ``queries()`` and
``oracle_sql()`` from this registry. Every SQL string is ANSI DuckDB over the
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings); column names/types/rounding match the Ray
implementations exactly (the driver compares sorted-by-name columns by
value hash).
"""

from __future__ import annotations

from nhse_probabilistic_linkage_ray.pipelines import queries_dedup as qd
from nhse_probabilistic_linkage_ray.pipelines import queries_relational as qr

# name -> (callable(sf_dir) -> Dataset/DataFrame, sql | None)
REGISTRY: dict = {
    # --- dedup / documents -------------------------------------------------
    "exact_dedup_groups": (qd.q_exact_dedup_groups, """
        SELECT md5(text) AS group_hash,
               min(doc_id) AS rep_id,
               count(*) AS n_members
        FROM documents GROUP BY md5(text)
    """),
    "exact_dedup_keep_first": (qd.q_exact_dedup_keep_first, """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    """),
    "exact_cluster_size_histogram": (qd.q_exact_cluster_size_histogram, """
        SELECT n_members, count(*) AS n_clusters
        FROM (SELECT count(*) AS n_members FROM documents GROUP BY md5(text))
        GROUP BY n_members
    """),
    "token_counts": (qd.q_token_counts, """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE coalesce(array_length(regexp_extract_all(trim(text), '\\S+')), 0)
               END::BIGINT AS n_tokens
        FROM documents
    """),
    "doc_normalize": (qd.q_doc_normalize, """
        SELECT doc_id,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
        FROM documents
    """),
    "quality_scores": (qd.q_quality_scores, None),   # unicode regex classes: rows-only
    "lang_id": (qd.q_lang_id, None),                 # heuristic model: rows-only
    "fingerprints": (qd.q_fingerprints, None),       # rolling-hash sketch: rows-only
    "word_jaccard_pairs": (qd.q_word_jaccard_pairs, """
        WITH w AS (
          SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '\\w+')) AS words
          FROM documents WHERE doc_id < 300
        )
        SELECT a.doc_id AS left_id, b.doc_id AS right_id,
               round(CASE WHEN len(a.words) = 0 AND len(b.words) = 0 THEN 1.0
                    ELSE len(list_intersect(a.words, b.words))::DOUBLE
                         / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))
               END, 6) AS jaccard
        FROM w a JOIN w b ON a.doc_id < b.doc_id
        WHERE CASE WHEN len(a.words) = 0 AND len(b.words) = 0 THEN 1.0
                   ELSE len(list_intersect(a.words, b.words))::DOUBLE
                        / (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words)))
              END >= 0.5
    """),
    "minhash_dedup_clusters": (qd.q_minhash_dedup_clusters, None),  # full pipeline: pytest-pinned
    "simhash_near_pairs": (qd.q_simhash_near_pairs, None),
    "ann_cosine_topk": (qd.q_ann_cosine_topk, """
        SELECT query_id, neighbor_id, cosine FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 5) AS cosine,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id
                 ) AS rk
          FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
          WHERE q.vec_id < 5
        ) WHERE rk <= 10
    """),
    "ann_ivf_topk": (
        # IVF approximate path — recall vs the brute-force baseline is pinned
        # by tests/test_arrays_similarity.py; rows-only for the driver
        (lambda sf_dir: __import__(
            "nhse_probabilistic_linkage_ray.pipelines.similarity",
            fromlist=["ann_ivf_topk"]).ann_ivf_topk(sf_dir)),
        None,
    ),
    "embedding_near_dup_pairs": (qd.q_embedding_near_dup_pairs, """
        SELECT a.vec_id AS left_id, b.vec_id AS right_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """),
    # --- relational parity -------------------------------------------------
    "anti_join_customers_without_orders": (qr.q_anti_join_customers_without_orders, """
        SELECT c_custkey FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """),
    "semi_join_customers_with_orders": (qr.q_semi_join_customers_with_orders, """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """),
    "left_join_coalesce_remap": (qr.q_left_join_coalesce_remap, """
        SELECT o_orderkey, coalesce(c_nationkey, -1)::BIGINT AS nation_key
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """),
    "full_outer_nation_counts": (qr.q_full_outer_nation_counts, """
        SELECT coalesce(c.k, s.k) AS nationkey,
               coalesce(c.n_cust, 0) AS n_cust,
               coalesce(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.k = s.k
    """),
    "orders_per_customer_histogram": (qr.q_orders_per_customer_histogram, """
        SELECT n_orders, count(*) AS n_customers
        FROM (SELECT count(*) AS n_orders FROM orders GROUP BY o_custkey)
        GROUP BY n_orders
    """),
    "lines_per_order_binned": (qr.q_lines_per_order_binned, """
        SELECT CASE WHEN n <= 1 THEN '1' WHEN n <= 2 THEN '2'
                    WHEN n <= 4 THEN '3-4' WHEN n <= 6 THEN '5-6' ELSE '7+' END AS bin,
               count(*) AS n_orders
        FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_orderkey)
        GROUP BY 1
    """),
    "supplier_listagg_per_nation": (qr.q_supplier_listagg_per_nation, """
        SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
        FROM supplier GROUP BY s_nationkey
    """),
    "confusion_matrix_one_pass": (qr.q_confusion_matrix_one_pass, """
        SELECT t.threshold,
               sum(CASE WHEN l_discount >= t.threshold AND l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS tp,
               sum(CASE WHEN l_discount >= t.threshold AND l_returnflag <> 'R' THEN 1 ELSE 0 END)::BIGINT AS fp
        FROM lineitem, (VALUES (0.02), (0.04), (0.06), (0.08)) t(threshold)
        GROUP BY t.threshold
    """),
    "discount_distribution": (qr.q_discount_distribution, """
        SELECT round(l_discount, 2) AS discount, count(*) AS n
        FROM lineitem GROUP BY 1
    """),
    "keep_latest_order_per_customer": (qr.q_keep_latest_order_per_customer, """
        SELECT o_custkey, o_orderkey AS latest_orderkey FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
          FROM orders) WHERE rk = 1
    """),
    "best_order_with_close_matches": (qr.q_best_order_with_close_matches, """
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
                 max(o_totalprice) OVER (PARTITION BY o_custkey) AS best_price
          FROM orders),
        close AS (
          SELECT o_custkey,
                 sum(CASE WHEN o_totalprice >= best_price * 0.95 THEN 1 ELSE 0 END) - 1 AS n_close
          FROM ranked GROUP BY o_custkey)
        SELECT r.o_custkey, r.o_orderkey AS best_orderkey, c.n_close::BIGINT AS n_close
        FROM ranked r JOIN close c ON r.o_custkey = c.o_custkey WHERE r.rk = 1
    """),
    "hash_bucket_sample": (qr.q_hash_bucket_sample, """
        SELECT o_orderkey FROM orders WHERE o_orderkey % 50 = 1
    """),
    "top20_orders_by_price": (qr.q_top20_orders_by_price, """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """),
    "union_distinct_nationkeys": (qr.q_union_distinct_nationkeys, """
        SELECT c_nationkey::BIGINT AS nationkey FROM customer
        UNION SELECT s_nationkey::BIGINT FROM supplier
    """),
    "explode_embeddings": (qr.q_explode_embeddings, """
        SELECT vec_id, generate_subscripts(embedding, 1)::BIGINT AS pos,
               round(unnest(embedding)::DOUBLE, 5) AS val
        FROM embeddings WHERE vec_id < 50
    """),
    "agreement_patterns": (qr.q_agreement_patterns, """
        SELECT l_orderkey, l_linenumber,
               (CASE l_returnflag WHEN 'R' THEN 2 WHEN 'A' THEN 1 ELSE 0 END)::VARCHAR
               || (CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)::VARCHAR
               || (CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)::VARCHAR AS agreement_pattern
        FROM lineitem
    """),
    "filter_projection": (qr.q_filter_projection, """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_quantity >= 45 AND l_returnflag = 'R'
    """),
    "tier_labels": (qr.q_tier_labels, """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 150000 THEN 'GOLD'
                    WHEN o_totalprice > 50000 THEN 'SILVER' ELSE 'BRONZE' END AS label
        FROM orders
    """),
    "join_lineitem_orders": (qr.q_join_lineitem_orders, """
        SELECT o_orderpriority, count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """),
    "returnflag_totals": (qr.q_returnflag_totals, """
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """),
    "hourly_event_counts": (qr.q_hourly_event_counts, """
        SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """),
    "user_sessions": (qr.q_user_sessions, """
        SELECT user_id, (sum(brk) + 1)::BIGINT AS n_sessions FROM (
          SELECT user_id,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM events) GROUP BY user_id
    """),
}


def queries() -> dict:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
