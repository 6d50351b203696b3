"""SQL-script DDL runner (SURVEY §2 SRC3).

The reference bootstraps its warehouse by executing a DDL file through
psycopg2 (comm_funcs.py:21-25). The Spark-native equivalent runs each
statement against the session catalog — useful for CREATE TABLE /
CREATE VIEW bootstrap scripts. Statements are split on top-level ';'
(quote- and comment-aware), skipping empties.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def split_statements(sql: str) -> list[str]:
    out, buf = [], []
    in_str = False
    in_line_comment = False
    in_block_comment = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < len(sql) else ""
        if in_line_comment:
            if ch == "\n":
                in_line_comment = False
            buf.append(ch)
        elif in_block_comment:
            if ch == "*" and nxt == "/":
                in_block_comment = False
                buf.append("*/")
                i += 1
            else:
                buf.append(ch)
        elif in_str:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "-" and nxt == "-":
            in_line_comment = True
            buf.append(ch)
        elif ch == "/" and nxt == "*":
            in_block_comment = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def run_ddl_script(spark: SparkSession, path: str) -> int:
    """Execute every statement in a SQL file; returns statements run."""
    with open(path, encoding="utf-8") as f:
        stmts = split_statements(f.read())
    for stmt in stmts:
        spark.sql(stmt)
    return len(stmts)
