from .testdata_queries import CATALOG, oracle_sql_map, queries_map  # noqa: F401
