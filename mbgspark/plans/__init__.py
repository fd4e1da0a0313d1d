from mbgspark.plans.catalog import CATALOG, oracle_sql_map, query_map

__all__ = ["CATALOG", "query_map", "oracle_sql_map"]
