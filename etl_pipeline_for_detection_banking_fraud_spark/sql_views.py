"""SQL API surface: register the warehouse + dimensions as temp views.

The reference's consumers query Postgres tables directly; this gives
them the same door — ``spark.sql("SELECT ... FROM rep_fraud")`` —
after :func:`register_views`. Catalyst produces identical plans for the
SQL and DataFrame formulations, so both surfaces share every operator
implementation and test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .sources.warehouse import Warehouse

_WAREHOUSE_TABLES = {
    "dwh_fact_transactions": None,  # special-cased: partitioned read
    "dwh_fact_passport_blacklist": schemas.PASSPORT_BLACKLIST,
    "dwh_dim_terminals_hist": schemas.TERMINALS_HIST,
    "rep_fraud": schemas.REP_FRAUD,
    "meta_loading": schemas.META_LOADING,
}


def register_views(wh: Warehouse, dims: dict[str, DataFrame] | None = None) -> list[str]:
    """Expose warehouse tables (and optionally the seed dims) as temp
    views; returns the registered view names."""
    names = []
    for table, schema in _WAREHOUSE_TABLES.items():
        df = wh.read_transactions(table) if table == "dwh_fact_transactions" else wh.read(
            table, schema
        )
        df.createOrReplaceTempView(table)
        names.append(table)
    for name, df in (dims or {}).items():
        df.createOrReplaceTempView(name)
        names.append(name)
    return names
