"""DuckDB oracle SQL twins for the relational suite (driver contract).

Every query mirrors its Ray implementation in
:mod:`job_crawler_ray.pipelines.relational` — same column NAMES, same
float rounding (6 dp), same date → ISO-string conversions, same
deterministic tie-breaks. Tables region/nation/customer/supplier/part/
orders/lineitem/events/documents/embeddings are pre-registered views.
"""

from __future__ import annotations

from job_crawler_ray.functions.extract import (
    BENEFIT_CLASSES,
    BENEFIT_KEYWORDS,
    EXPERIENCE_INDICATORS,
    REMOTE_INDICATORS,
    TECH_KEYWORDS,
)
from job_crawler_ray.pipelines.relational import (
    ERROR_VALUE,
    EVENTS_WINDOW,
    EVENTS_WINDOW_1H,
    RESPONDED_VALUE,
    RETENTION_CUTOFF,
)

NOW_SQL = "TIMESTAMP '2002-01-01'"


def _sql_str_list(words) -> str:
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"


def _any_contains(col: str, words) -> str:
    return "(" + " OR ".join(f"contains({col}, '{w}')" for w in words) + ")"


def _first_match_case(col: str, classes: dict) -> str:
    whens = "\n".join(
        f"WHEN {_any_contains(col, kws)} THEN '{label}'"
        for label, kws in classes.items()
    )
    return f"CASE {whens} ELSE 'not_specified' END"


def oracle_queries() -> dict[str, str]:
    tech_list = _sql_str_list(TECH_KEYWORDS)
    benefit_case_items = ", ".join(
        f"CASE WHEN {_any_contains('lower(text)', kws)} "
        f"THEN '{label.replace('_', ' ').title()}' END"
        for label, kws in BENEFIT_CLASSES.items()
    )

    return {
        "a1_status_breakdown": """
            SELECT event_type, count(*) AS cnt
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "a2_popular_top": f"""
            SELECT event_type, count(*) AS cnt,
                   round(avg(value), 6) AS avg_value
            FROM events WHERE ts > TIMESTAMP '{EVENTS_WINDOW}'
            GROUP BY event_type
            ORDER BY cnt DESC, event_type ASC LIMIT 3
        """,
        "a3_top_hosts": """
            SELECT l_suppkey, count(*) AS cnt
            FROM lineitem GROUP BY l_suppkey
            ORDER BY cnt DESC, l_suppkey ASC LIMIT 5
        """,
        "a4_by_segment": """
            SELECT c_mktsegment, count(*) AS cnt
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "a5_success_metrics": f"""
            SELECT count(*) AS total_events,
                   count(*) FILTER (WHERE value > {RESPONDED_VALUE}) AS responded,
                   count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
                   round(coalesce(
                       sum(value) FILTER (WHERE value > {RESPONDED_VALUE})
                       / nullif(count(*) FILTER (WHERE value > {RESPONDED_VALUE}), 0),
                       0), 6) AS avg_responded_value
            FROM events
        """,
        "a6_api_performance": f"""
            SELECT event_type,
                   count(*) AS cnt,
                   CAST(sum(CASE WHEN value > {ERROR_VALUE} THEN 1 ELSE 0 END) AS BIGINT) AS errors,
                   round(avg(value), 6) AS avg_value,
                   round(sum(CASE WHEN value > {ERROR_VALUE} THEN 1 ELSE 0 END)
                         / greatest(count(*), 1), 6) AS error_rate
            FROM events WHERE ts > TIMESTAMP '{EVENTS_WINDOW_1H}'
            GROUP BY event_type ORDER BY event_type
        """,
        "a7_health_counts": """
            SELECT (SELECT count(*) FROM orders) AS orders_cnt,
                   (SELECT count(*) FROM lineitem) AS lineitem_cnt
        """,
        "a8_retention_expiry": f"""
            SELECT event_type, count(*) AS cnt
            FROM events WHERE ts >= TIMESTAMP '{RETENTION_CUTOFF}'
            GROUP BY event_type ORDER BY event_type
        """,
        "j1_left_join_summary": """
            SELECT o_orderkey,
                   coalesce(c_name, 'Unknown Customer') AS customer_name,
                   coalesce(c_mktsegment, 'UNKNOWN') AS mktsegment,
                   o_totalprice,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "j2_anti_join_idle": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        """,
        "o1_sort_recent": """
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM orders ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100
        """,
        "m1_extract_features": f"""
            SELECT doc_id,
                   {_first_match_case('lower(text)', EXPERIENCE_INDICATORS)} AS experience_level,
                   {_first_match_case('lower(text)', REMOTE_INDICATORS)} AS remote_policy,
                   {_any_contains('lower(text)', BENEFIT_KEYWORDS)} AS has_benefits,
                   length(text) AS description_length,
                   coalesce(array_to_string(
                       list_filter({tech_list}, k -> contains(lower(text), k)),
                       ','), '') AS tech_stack_csv
            FROM documents
        """,
        "m2_framework_truncate": """
            SELECT doc_id, substr(text, 1, 800) AS desc800,
                   length(substr(text, 1, 800)) AS desc800_len
            FROM documents
        """,
        "m6_derived_dates": f"""
            SELECT o_orderkey,
                   strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS follow_up_date,
                   strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS move_on_date,
                   date_diff('day', o_orderdate, {NOW_SQL}) AS days_since,
                   (date_diff('day', o_orderdate, {NOW_SQL}) >= 7
                    AND o_orderstatus = 'O') AS needs_follow_up
            FROM orders
        """,
        "m7_benefit_classes": f"""
            SELECT doc_id,
                   coalesce(array_to_string(
                       list_filter([{benefit_case_items}], x -> x IS NOT NULL),
                       ','), '') AS benefit_classes_csv
            FROM documents
        """,
        "d1_dedup_first_per_source": """
            SELECT doc_id, source, n_chars FROM (
                SELECT doc_id, source, n_chars,
                       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1 ORDER BY source
        """,
        "d1_dedup_exact_text": """
            -- coalesce(text, '') matches the Ray side's content key,
            -- which maps null text to the empty byte string
            SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY coalesce(text, '')
                                          ORDER BY doc_id) AS rn
                FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
            ) WHERE rn = 1 ORDER BY doc_id
        """,
        "d2_upsert_last_wins": """
            SELECT user_id, event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
            FROM (
                SELECT user_id, event_id, ts,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1 ORDER BY user_id
        """,
        "d3_distinct_pairs": """
            SELECT DISTINCT lang, source FROM documents ORDER BY lang, source
        """,
        "m8_role_classifier": """
            SELECT p_partkey,
                   CASE WHEN contains(lower(p_type), 'brass') THEN 'brass'
                        WHEN contains(lower(p_type), 'steel') THEN 'steel'
                        WHEN contains(lower(p_type), 'copper') THEN 'copper'
                        ELSE 'other' END AS family,
                   CASE WHEN contains(lower(p_type), 'anodized') THEN 'senior'
                        WHEN contains(lower(p_type), 'polished') THEN 'mid'
                        ELSE 'junior' END AS tier
            FROM part
        """,
        "m11_broadcast_attach": """
            SELECT c_custkey, c_mktsegment,
                   CASE c_mktsegment
                        WHEN 'AUTOMOBILE' THEN 55000.0
                        WHEN 'BUILDING'   THEN 62000.0
                        WHEN 'FURNITURE'  THEN 58000.0
                        WHEN 'HOUSEHOLD'  THEN 51000.0
                        WHEN 'MACHINERY'  THEN 65000.0
                        ELSE 0.0 END AS salary_band
            FROM customer
        """,
        "m10_templates": """
            SELECT c_custkey,
                   'Dear ' || c_name || ', thank you for your interest in the '
                       || c_mktsegment || ' segment.' AS cover_letter,
                   c_name || ' | segment: ' || c_mktsegment AS cv_header
            FROM customer
        """,
        "s1_stratified_split": """
            SELECT lang, source,
                   CASE WHEN doc_id % 10 = 0 THEN 'val' ELSE 'train' END AS split,
                   count(*) AS cnt
            FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "u1_multi_source_union": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM (
                    SELECT doc_id, source FROM documents WHERE doc_id % 2 = 0
                    UNION ALL
                    SELECT doc_id, source FROM documents WHERE doc_id % 2 = 1
                )
            ) WHERE rn = 1 ORDER BY source
        """,
        "o3_limit_after_dedup": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1 ORDER BY doc_id LIMIT 10
        """,
    }
