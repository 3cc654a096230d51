from oxbow_spark.queries.registry import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "query_map", "oracle_sql_map"]
