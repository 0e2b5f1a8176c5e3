from data_etl_pipeline_spark.plans.registry import QUERIES, QuerySpec, all_oracle_sql, all_queries

__all__ = ["QUERIES", "QuerySpec", "all_queries", "all_oracle_sql"]
