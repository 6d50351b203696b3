"""Seed-dimension loader: INSERT...VALUES SQL script -> Spark DataFrames.

The reference ships its three static dimensions (cards 195, accounts 77,
clients 50 rows) as a seed DML script (reference: data/ddl_dml.sql,
SURVEY §2 SRC4). This one-time bootstrap is driver-side by nature; the
parser handles the single-row ``insert into <t> (...) values (...);``
shape that script uses. Dimensions this small are broadcast-join
material downstream — never the shuffled side.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..functions.localframe import local_rows_df

_INSERT_RE = re.compile(
    r"insert\s+into\s+(\w+)\s*\(([^)]*)\)\s*values\s*\((.*?)\)\s*;",
    re.IGNORECASE | re.DOTALL,
)

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _split_values(body: str) -> list[str]:
    """Split a VALUES tuple body on top-level commas (quote-aware)."""
    parts, buf, in_str = [], [], False
    i = 0
    while i < len(body):
        ch = body[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(body) and body[i + 1] == "'":  # escaped ''
                    buf.append("'")
                    i += 2
                    continue
                in_str = False
            else:
                buf.append(ch)
        else:
            if ch == "'":
                in_str = True
                buf.append("\x00")  # mark as string literal
            elif ch == ",":
                parts.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        i += 1
    parts.append("".join(buf).strip())
    return parts


def _coerce(token: str):
    if token.startswith("\x00"):
        s = token[1:]
        return datetime.date.fromisoformat(s) if _DATE_RE.match(s) else s
    low = token.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(token)
    except ValueError:
        try:
            return float(token)
        except ValueError:
            return token


def parse_seed_dml(path: str) -> dict[str, list[dict]]:
    """Parse every INSERT in the script into {table: [row dicts]}."""
    with open(path, encoding="utf-8") as f:
        sql = f.read()
    tables: dict[str, list[dict]] = {}
    for m in _INSERT_RE.finditer(sql):
        table = m.group(1).lower()
        cols = [c.strip().lower() for c in m.group(2).split(",")]
        vals = [_coerce(v) for v in _split_values(m.group(3))]
        tables.setdefault(table, []).append(dict(zip(cols, vals)))
    return tables


_SEED_SCHEMAS = {
    "cards": schemas.CARDS,
    "accounts": schemas.ACCOUNTS,
    "clients": schemas.CLIENTS,
}


def load_seed_dims(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Load cards/accounts/clients from the seed script as typed DataFrames."""
    parsed = parse_seed_dml(path)
    out = {}
    for name, schema in _SEED_SCHEMAS.items():
        rows = parsed.get(name, [])
        data = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
        out[name] = local_rows_df(spark, data, schema)
    return out
