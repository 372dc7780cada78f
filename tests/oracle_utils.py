"""Pre-flight mirror of the driver's DuckDB-oracle comparison:
row-count + column-name schema + order-insensitive canonical values."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_cell(x) for x in v))
    return ("s", str(v))


def canon(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    cols = [colnames[i] for i in order]
    out = sorted(
        (tuple(_cell(r[i]) for i in order) for r in rows), key=lambda t: repr(t)
    )
    return cols, out


def compare(spark_df, duck_con, sql, key=""):
    srows = spark_df.collect()
    scols = spark_df.columns
    res = duck_con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{key}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), (
        f"{key}: row count spark={len(srows)} duck={len(drows)}"
    )
    _, sc = canon(scols, [tuple(r) for r in srows])
    _, dc = canon(dcols, drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs: {diffs}")
