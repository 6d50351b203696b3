"""Explicit StructType schemas for every feed and warehouse table.

The reference lets pandas ``to_sql`` infer staging schemas
(reference: sql_scripts/create_tables.sql:1-24 — staging DDL is
deliberately commented out) which forced its manual decimal-comma cast
hack (reference: main.py:49). This engine declares every schema up
front: inference over a 100 TB feed is both slow (extra pass) and
unsafe (type drift between days).

Warehouse table shapes follow reference sql_scripts/create_tables.sql:
27-71; FIXTURES.md documents the feed shapes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Feed schemas (raw, as read from files)
# ---------------------------------------------------------------------------

# transactions CSV: ';'-separated, header, decimal-comma amounts
# (reference: main.py:45-50; FIXTURES.md §1). `amount` arrives as a
# string ('1046,40') and is cast by sources.csv_source.
TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("transaction_date", T.StringType(), False),
        T.StructField("amount", T.StringType(), False),
        T.StructField("card_num", T.StringType(), False),
        T.StructField("oper_type", T.StringType(), False),
        T.StructField("oper_result", T.StringType(), False),
        T.StructField("terminal", T.StringType(), False),
    ]
)

# typed shape shared by staging and DWH_FACT_TRANSACTIONS
# (reference: create_tables.sql:27-35)
TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("transaction_date", T.TimestampType(), False),
        T.StructField("amount", T.DecimalType(10, 2), False),
        T.StructField("card_num", T.StringType(), False),
        T.StructField("oper_type", T.StringType(), False),
        T.StructField("oper_result", T.StringType(), False),
        T.StructField("terminal", T.StringType(), False),
    ]
)

# terminals XLSX full snapshot (reference: create_tables.sql:14-19)
TERMINALS = T.StructType(
    [
        T.StructField("terminal_id", T.StringType(), False),
        T.StructField("terminal_type", T.StringType(), True),
        T.StructField("terminal_city", T.StringType(), True),
        T.StructField("terminal_address", T.StringType(), True),
    ]
)

# passport blacklist XLSX, cumulative (reference: create_tables.sql:21-24,
# :37-40). `date` arrives as an Excel serial number in the raw sheet.
PASSPORT_BLACKLIST = T.StructType(
    [
        T.StructField("date", T.DateType(), True),
        T.StructField("passport", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Static seed dimensions (reference: data/ddl_dml.sql:7-12,606-612,776-787)
# ---------------------------------------------------------------------------

CARDS = T.StructType(
    [
        T.StructField("card_num", T.StringType(), False),
        T.StructField("account", T.StringType(), False),
        T.StructField("create_dt", T.DateType(), True),
        T.StructField("update_dt", T.DateType(), True),
    ]
)

ACCOUNTS = T.StructType(
    [
        T.StructField("account", T.StringType(), False),
        T.StructField("valid_to", T.DateType(), True),
        T.StructField("client", T.StringType(), False),
        T.StructField("create_dt", T.DateType(), True),
        T.StructField("update_dt", T.DateType(), True),
    ]
)

CLIENTS = T.StructType(
    [
        T.StructField("client_id", T.StringType(), False),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("patronymic", T.StringType(), True),  # nullable: fio concat uses coalesce
        T.StructField("date_of_birth", T.DateType(), True),
        T.StructField("passport_num", T.StringType(), True),
        T.StructField("passport_valid_to", T.DateType(), True),  # NULL = non-expiring
        T.StructField("phone", T.StringType(), True),
        T.StructField("create_dt", T.DateType(), True),
        T.StructField("update_dt", T.DateType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse outputs
# ---------------------------------------------------------------------------

# SCD2 terminal history (reference: create_tables.sql:44-52).
# effective_to open sentinel is date 9999-12-31 (ref: 'infinity'::date).
TERMINALS_HIST = T.StructType(
    [
        T.StructField("terminal_id", T.StringType(), False),
        T.StructField("terminal_type", T.StringType(), True),
        T.StructField("terminal_city", T.StringType(), True),
        T.StructField("terminal_address", T.StringType(), True),
        T.StructField("effective_from", T.DateType(), False),
        T.StructField("effective_to", T.DateType(), False),
        T.StructField("deleted_flg", T.BooleanType(), False),
    ]
)

# fraud report mart (reference: create_tables.sql:55-62)
REP_FRAUD = T.StructType(
    [
        T.StructField("event_dt", T.TimestampType(), True),
        T.StructField("passport", T.StringType(), True),
        T.StructField("fio", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("report_dt", T.DateType(), True),
    ]
)

# audit trail (reference: create_tables.sql:66-71)
META_LOADING = T.StructType(
    [
        T.StructField("table_name", T.StringType(), True),
        T.StructField("event_dt", T.DateType(), True),
        T.StructField("rows_processed", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

FRAUD_EVENT_TYPES = (
    "blocked or expired passport",
    "invalid contract",
    "ops in diff cities less one hour",
    "amount guessing",
)
