"""Scalar expression helpers — the engine's entire scalar surface.

Everything here is a pure Column-in/Column-out builder over
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd); no Python
UDFs. Each helper encodes a semantic the reference gets from Postgres
and Spark does NOT replicate silently (SURVEY §2 S1-S11, §4).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SCD2 open-interval sentinel (reference 'infinity'::date, create_tables.sql:50)
SCD2_OPEN_END_DATE = datetime.date(9999, 12, 31)


def scd2_open_end() -> Column:
    return F.lit(SCD2_OPEN_END_DATE)


def decimal_comma_amount(col: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """Parse a decimal-comma money string ('1046,40') to DecimalType.

    Reference: main.py:49 casts via pandas str.replace + float — a lossy
    float round-trip. Decimal is exact, which matters because fraud
    rule 4 compares amounts for strict ordering (loading_rep_fraud.py:120-121).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ",", ".").cast(f"decimal({precision},{scale})")


def fio(last: Column | str = "last_name", first: Column | str = "first_name",
        patronymic: Column | str = "patronymic") -> Column:
    """Client full name: CONCAT(last, ' ', first, ' ', COALESCE(patronymic, '')).

    Reference: loading_rep_fraud.py:20. Postgres CONCAT skips NULL args;
    Spark concat() returns NULL if ANY arg is NULL, so the coalesce on the
    nullable patronymic is load-bearing (SURVEY §2 S4).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in (last, first, patronymic)]
    return F.concat(cols[0], F.lit(" "), cols[1], F.lit(" "), F.coalesce(cols[2], F.lit("")))


def epoch_diff(later: Column, earlier: Column) -> Column:
    """Seconds between two timestamps: EXTRACT(EPOCH FROM (t2 - t1)).

    Reference: loading_rep_fraud.py:76,110,113,122. Long-cast keeps the
    expression codegen-able; sub-second parts are truncated identically
    to the reference data (whole-second timestamps).
    """
    return later.cast("long") - earlier.cast("long")


def ts_between_dates(ts: Column, d_from: Column, d_to: Column) -> Column:
    """Timestamp-vs-date BETWEEN with Postgres coercion semantics.

    Reference: loading_rep_fraud.py:81,83 probes
    ``ts BETWEEN effective_from AND effective_to`` where the bounds are
    DATEs. Postgres promotes date -> timestamp-at-midnight, so a
    transaction at 14:00 on the effective_to day does NOT match. Spark
    must cast the dates to timestamps explicitly to reproduce that
    (to_date(ts).between(...) would wrongly include the whole end day).
    """
    return (ts >= d_from.cast("timestamp")) & (ts <= d_to.cast("timestamp"))


def excel_serial_to_date(col: Column | str) -> Column:
    """Excel serial day number -> date (serial 44256 == 2021-03-01).

    Excel's epoch is 1899-12-30 for this range (the famous 1900 leap-year
    bug means the offset base is -30, not -31). Reference gets this
    implicitly from pandas read_excel (SURVEY §2 S11).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.lit(datetime.date(1899, 12, 30)), c.cast("int"))
