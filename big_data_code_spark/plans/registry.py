"""Central registry: query name → (spark callable, oracle SQL).

The driver consumes this via ``__spark_entry__.queries()`` /
``oracle_sql()``. Every SQL-expressible query has a DuckDB oracle;
approximate / stateful ops register with ``None`` oracle (driver
falls back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import advanced, llm, speed, swa, tpch

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "pageviews_over_time": swa.pageviews_over_time,
    "uniques_over_time": swa.uniques_over_time,
    "uniques_over_time_hll": swa.uniques_over_time_hll,
    "uniques_over_time_normalized": swa.uniques_over_time_normalized,
    "bounce_rate": swa.bounce_rate,
    "dedup_events": swa.dedup_events,
    "normalize_urls": swa.normalize_urls,
    "user_id_normalization": swa.user_id_normalization,
    "normalized_events": swa.normalized_events,
    "q1_pricing_summary": tpch.q1_pricing_summary,
    "q3_shipping_priority": tpch.q3_shipping_priority,
    "q5_local_supplier_volume": tpch.q5_local_supplier_volume,
    "q6_forecast_revenue": tpch.q6_forecast_revenue,
    "top_users_by_event_type": tpch.top_users_by_event_type,
    "running_daily_revenue": tpch.running_daily_revenue,
    "customers_no_orders": tpch.customers_no_orders,
    "sales_rollup": tpch.sales_rollup,
    "q4_order_priority": tpch.q4_order_priority,
    "q10_returned_items": tpch.q10_returned_items,
    "q17_small_quantity_revenue": tpch.q17_small_quantity_revenue,
    "viewers_set_ops": tpch.viewers_set_ops,
    "rich_customers": tpch.rich_customers,
    "dedup_exact": llm.dedup_exact,
    "dedup_ngram_jaccard": llm.dedup_ngram_jaccard,
    "dedup_minhash_lsh": llm.dedup_minhash_lsh,
    "simhash_fingerprint": llm.simhash_fingerprint,
    "doc_fingerprint": llm.doc_fingerprint,
    "dedup_corpus_final": llm.dedup_corpus_final,
    "dedup_embedding_cosine": llm.dedup_embedding_cosine,
    "ann_cosine_topk": llm.ann_cosine_topk,
    "ann_lsh": llm.ann_lsh,
    "text_stats": llm.text_stats,
    "lang_id": llm.lang_id,
    "token_counts": llm.token_counts,
    "tfidf_top_terms": llm.tfidf_top_terms,
    "hash_split": llm.hash_split,
    "stratified_sample": llm.stratified_sample,
    "multimodal_features": llm.multimodal_features,
    "props_json_extract": advanced.props_json_extract,
    "asof_last_event_value": advanced.asof_last_event_value,
    "value_percentiles": advanced.value_percentiles,
    "user_event_pivot": advanced.user_event_pivot,
    "hourly_gap_fill": advanced.hourly_gap_fill,
    "user_event_unpivot": advanced.user_event_unpivot,
    "scd2_customer_updates": advanced.scd2_customer_updates,
    "events_near_pairs": advanced.events_near_pairs,
    "streaming_pageviews_hourly": speed.streaming_pageviews_hourly,
    "streaming_uniques_hourly_hll": speed.streaming_uniques_hourly_hll,
    "streaming_bounce_rate": speed.streaming_bounce_rate,
    "lambda_merged_pageviews": speed.lambda_merged_pageviews,
}

#: name → DuckDB SQL; None ⇒ not SQL-expressible / approximate →
#: the driver records a rows-only check.
ORACLES: dict[str, str | None] = {
    "pageviews_over_time": swa.PAGEVIEWS_OVER_TIME_SQL,
    "uniques_over_time": swa.UNIQUES_OVER_TIME_SQL,
    "uniques_over_time_hll": None,
    "uniques_over_time_normalized": swa.UNIQUES_NORMALIZED_SQL,
    "bounce_rate": swa.BOUNCE_RATE_SQL,
    "dedup_events": swa.DEDUP_EVENTS_SQL,
    "normalize_urls": swa.NORMALIZE_URLS_SQL,
    "user_id_normalization": swa.USER_ID_NORMALIZATION_SQL,
    "normalized_events": swa.NORMALIZED_EVENTS_SQL,
    "q1_pricing_summary": tpch.Q1_SQL,
    "q3_shipping_priority": tpch.Q3_SQL,
    "q5_local_supplier_volume": tpch.Q5_SQL,
    "q6_forecast_revenue": tpch.Q6_SQL,
    "top_users_by_event_type": tpch.TOP_USERS_SQL,
    "running_daily_revenue": tpch.RUNNING_DAILY_SQL,
    "customers_no_orders": tpch.CUSTOMERS_NO_ORDERS_SQL,
    "sales_rollup": tpch.SALES_ROLLUP_SQL,
    "q4_order_priority": tpch.Q4_SQL,
    "q10_returned_items": tpch.Q10_SQL,
    "q17_small_quantity_revenue": tpch.Q17_SQL,
    "viewers_set_ops": tpch.VIEWERS_SET_OPS_SQL,
    "rich_customers": tpch.RICH_CUSTOMERS_SQL,
    "dedup_exact": llm.DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": llm.DEDUP_NGRAM_JACCARD_SQL,
    "dedup_minhash_lsh": llm.DEDUP_MINHASH_LSH_SQL,
    "simhash_fingerprint": None,
    "doc_fingerprint": None,
    "dedup_corpus_final": llm.DEDUP_CORPUS_FINAL_SQL,
    "dedup_embedding_cosine": llm.DEDUP_EMBEDDING_COSINE_SQL,
    "ann_cosine_topk": llm.ANN_COSINE_TOPK_SQL,
    "ann_lsh": None,
    "text_stats": llm.TEXT_STATS_SQL,
    "lang_id": llm.LANG_ID_SQL,
    "token_counts": llm.TOKEN_COUNTS_SQL,
    "tfidf_top_terms": llm.TFIDF_TOP_TERMS_SQL,
    "hash_split": llm.HASH_SPLIT_SQL,
    "stratified_sample": None,
    "multimodal_features": None,
    "props_json_extract": advanced.PROPS_JSON_EXTRACT_SQL,
    "asof_last_event_value": advanced.ASOF_LAST_EVENT_VALUE_SQL,
    "value_percentiles": advanced.VALUE_PERCENTILES_SQL,
    "user_event_pivot": advanced.USER_EVENT_PIVOT_SQL,
    "hourly_gap_fill": advanced.HOURLY_GAP_FILL_SQL,
    "user_event_unpivot": advanced.USER_EVENT_UNPIVOT_SQL,
    "scd2_customer_updates": advanced.SCD2_CUSTOMER_UPDATES_SQL,
    "events_near_pairs": advanced.EVENTS_NEAR_PAIRS_SQL,
    "streaming_pageviews_hourly": speed.STREAMING_PAGEVIEWS_HOURLY_SQL,
    "streaming_uniques_hourly_hll": None,
    "streaming_bounce_rate": None,
    "lambda_merged_pageviews": speed.LAMBDA_MERGED_PAGEVIEWS_SQL,
}
