from .testdata_queries import CATALOG, oracle_sql_map, queries_map  # noqa: F401

from . import data_pipeline_queries  # noqa: E402,F401  (registers into CATALOG)
from . import extended_queries  # noqa: E402,F401  (registers into CATALOG)
from . import lakehouse_queries  # noqa: E402,F401  (registers into CATALOG)
