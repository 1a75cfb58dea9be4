"""Gold serving layer (README.md:28-41: HDFS processed data +
'fast querying & analytics' store feeding Grafana/Superset).

Materializes curated gold tables from the registry's queries into a
parquet serving area. Dashboards (or a `spark.sql` thrift endpoint,
or a document-store export via foreachBatch) read these instead of
recomputing; the build is idempotent (overwrite per table).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bigdata_project_spark.registry import REGISTRY, _ensure_loaded

# query name -> gold table name
GOLD_TABLES = {
    "events_rate_per_type_day": "gold_event_rates_daily",
    "join_revenue_per_nation": "gold_revenue_per_nation",
    "join_range_price_bands": "gold_price_bands",
    "agg_rollup_region_nation": "gold_supplier_rollup",
    "window_top3_per_segment": "gold_top_customers",
    "text_stats_quality": "gold_doc_quality",
}


def build_gold(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Materialize every gold table; returns table -> path."""
    _ensure_loaded()
    paths = {}
    for query_name, table in GOLD_TABLES.items():
        df = REGISTRY[query_name].fn(spark, sf_dir)
        path = f"{out_dir}/{table}"
        df.write.mode("overwrite").parquet(path)
        paths[table] = path
    return paths
