"""Independent DuckDB replay oracle for the reference pipeline semantics.

Re-expresses the reference's warehouse logic (SURVEY §2/§3) as DuckDB
SQL — written from the semantic spec, not copied — so the Spark engine's
3-day replay output can be differentially checked value-for-value.
DuckDB shares Postgres's coercion rules that matter here (date ->
timestamp promotion in BETWEEN, DISTINCT ON, IS DISTINCT FROM), which is
exactly why it can stand in for the reference's Postgres executor.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd

OPEN_END = "DATE '9999-12-31'"


def make_oracle() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE TABLE fact_tx (
            transaction_id VARCHAR, transaction_date TIMESTAMP,
            amount DECIMAL(10,2), card_num VARCHAR, oper_type VARCHAR,
            oper_result VARCHAR, terminal VARCHAR);
        CREATE TABLE fact_bl (dt DATE, passport VARCHAR);
        CREATE TABLE hist (
            terminal_id VARCHAR, terminal_type VARCHAR, terminal_city VARCHAR,
            terminal_address VARCHAR, effective_from DATE,
            effective_to DATE DEFAULT {OPEN_END},
            deleted_flg BOOLEAN DEFAULT FALSE);
        CREATE TABLE mart (
            event_dt TIMESTAMP, passport VARCHAR, fio VARCHAR, phone VARCHAR,
            event_type VARCHAR, report_dt DATE);
        """
    )
    return con


def load_dims(con: duckdb.DuckDBPyConnection, cards: pd.DataFrame,
              accounts: pd.DataFrame, clients: pd.DataFrame) -> None:
    con.register("cards_pdf", cards)
    con.register("accounts_pdf", accounts)
    con.register("clients_pdf", clients)
    con.execute("CREATE TABLE cards AS SELECT * FROM cards_pdf")
    con.execute("CREATE TABLE accounts AS SELECT * FROM accounts_pdf")
    con.execute("CREATE TABLE clients AS SELECT * FROM clients_pdf")


def run_day(con: duckdb.DuckDBPyConnection, tx: pd.DataFrame, bl: pd.DataFrame,
            terminals: pd.DataFrame, date_global: datetime.date) -> None:
    con.register("stg_tx", tx)
    con.register("stg_bl", bl)
    con.register("stg_term", terminals)
    d = f"DATE '{date_global.isoformat()}'"

    # facts: blacklist dedup-append on passport; transactions plain append
    con.execute(
        """
        INSERT INTO fact_bl
        SELECT s.dt, s.passport FROM stg_bl s
        WHERE s.passport NOT IN (SELECT passport FROM fact_bl)
        """
    )
    con.execute(
        "INSERT INTO fact_tx SELECT transaction_id, transaction_date, "
        "CAST(amount AS DECIMAL(10,2)), card_num, oper_type, oper_result, terminal FROM stg_tx"
    )

    # SCD2 increment: new / vanished / changed-vs-any-version (null-safe)
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE inc_new AS
        SELECT s.* FROM stg_term s
        WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.terminal_id = s.terminal_id)
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE inc_deleted AS
        SELECT h.terminal_id, h.terminal_type, h.terminal_city, h.terminal_address
        FROM hist h
        WHERE NOT EXISTS (SELECT 1 FROM stg_term s WHERE s.terminal_id = h.terminal_id)
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE inc_updated AS
        SELECT s.* FROM stg_term s JOIN hist h USING (terminal_id)
        WHERE s.terminal_type IS DISTINCT FROM h.terminal_type
           OR s.terminal_city IS DISTINCT FROM h.terminal_city
           OR s.terminal_address IS DISTINCT FROM h.terminal_address
        """
    )
    con.execute(f"INSERT INTO hist BY NAME SELECT *, {d} AS effective_from FROM inc_new")
    con.execute(
        f"""
        UPDATE hist SET effective_to = CAST({d} - INTERVAL 1 DAY AS DATE)
        WHERE terminal_id IN (SELECT terminal_id FROM inc_updated)
          AND effective_to = {OPEN_END}
        """
    )
    con.execute(f"INSERT INTO hist BY NAME SELECT *, {d} AS effective_from FROM inc_updated")
    con.execute(
        f"""
        UPDATE hist SET effective_to = CAST({d} - INTERVAL 1 DAY AS DATE)
        WHERE terminal_id IN (SELECT terminal_id FROM inc_deleted)
          AND effective_to = {OPEN_END}
        """
    )
    con.execute(
        f"INSERT INTO hist BY NAME SELECT *, {d} AS effective_from, TRUE AS deleted_flg "
        "FROM inc_deleted"
    )

    fio = "concat(cl.last_name, ' ', cl.first_name, ' ', coalesce(cl.patronymic, ''))"
    enrich = (
        "JOIN cards ca ON {t}.card_num = ca.card_num "
        "JOIN accounts ac ON ca.account = ac.account "
        "JOIN clients cl ON ac.client = cl.client_id"
    )

    # rule 1: blocked or expired passport
    con.execute(
        f"""
        INSERT INTO mart
        SELECT t.transaction_date, cl.passport_num, {fio}, cl.phone,
               'blocked or expired passport', {d}
        FROM fact_tx t {enrich.format(t='t')}
        LEFT JOIN fact_bl b ON cl.passport_num = b.passport
        WHERE ((cl.passport_valid_to < CAST(t.transaction_date AS DATE))
               OR (b.passport IS NOT NULL AND CAST(t.transaction_date AS DATE) > b.dt))
          AND t.oper_result = 'SUCCESS'
        """
    )
    # rule 2: invalid contract
    con.execute(
        f"""
        INSERT INTO mart
        SELECT t.transaction_date, cl.passport_num, {fio}, cl.phone,
               'invalid contract', {d}
        FROM fact_tx t {enrich.format(t='t')}
        WHERE CAST(t.transaction_date AS DATE) > ac.valid_to
          AND t.oper_result = 'SUCCESS'
        """
    )
    # rule 3: different cities within one hour
    con.execute(
        f"""
        INSERT INTO mart
        SELECT DISTINCT ON (t2.transaction_date, cl.passport_num)
               t2.transaction_date, cl.passport_num, {fio}, cl.phone,
               'ops in diff cities less one hour', {d}
        FROM fact_tx t1
        JOIN fact_tx t2 ON t1.card_num = t2.card_num
             AND t1.transaction_date < t2.transaction_date
             AND date_part('epoch', t2.transaction_date - t1.transaction_date) < 3600
        {enrich.format(t='t2')}
        JOIN hist h1 ON t1.terminal = h1.terminal_id
             AND t1.transaction_date BETWEEN h1.effective_from AND h1.effective_to
        JOIN hist h2 ON t2.terminal = h2.terminal_id
             AND t2.transaction_date BETWEEN h2.effective_from AND h2.effective_to
        WHERE h1.terminal_city <> h2.terminal_city
          AND t2.oper_result = 'SUCCESS'
          AND NOT EXISTS (
              SELECT 1 FROM mart m WHERE m.passport = cl.passport_num
                AND m.event_dt = t2.transaction_date
                AND m.event_type = 'ops in diff cities less one hour')
        """
    )
    # rule 4: amount guessing
    con.execute(
        f"""
        INSERT INTO mart
        SELECT DISTINCT ON (t3.transaction_date, cl.passport_num)
               t3.transaction_date, cl.passport_num, {fio}, cl.phone,
               'amount guessing', {d}
        FROM fact_tx t1
        JOIN fact_tx t2 ON t1.card_num = t2.card_num
             AND t1.transaction_date < t2.transaction_date
             AND date_part('epoch', t2.transaction_date - t1.transaction_date) < 1200
        JOIN fact_tx t3 ON t2.card_num = t3.card_num
             AND t2.transaction_date < t3.transaction_date
             AND date_part('epoch', t3.transaction_date - t2.transaction_date) < 1200
        {enrich.format(t='t3')}
        WHERE t1.oper_result = 'REJECT' AND t2.oper_result = 'REJECT'
          AND t3.oper_result = 'SUCCESS'
          AND t1.amount > t2.amount AND t2.amount > t3.amount
          AND date_part('epoch', t3.transaction_date - t1.transaction_date) < 1200
          AND NOT EXISTS (
              SELECT 1 FROM mart m WHERE m.passport = cl.passport_num
                AND m.event_dt = t3.transaction_date
                AND m.event_type = 'amount guessing')
        """
    )
    con.unregister("stg_tx")
    con.unregister("stg_bl")
    con.unregister("stg_term")
