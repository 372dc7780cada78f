"""Pre-flight mirror of the driver's DuckDB-oracle comparison.

The driver canonicalizes BOTH result sets through pandas
(``spark_df.toPandas()`` vs ``duck.execute(sql).df()``) and hashes
type-tagged values, so dtype coercions that pandas applies — e.g.
DuckDB HUGEINT → float64 while Spark emits int64 — are VISIBLE to the
driver.  Round 2 proved a ``fetchall()``-based pre-flight is blind to
that class (pre-flight green, driver red on ``fn_array_lambda`` /
``pipeline_pretrain_filter``).  This version fetches through pandas on
both sides and tags cells by their numpy dtype, so a pandas-level
int-vs-float divergence fails locally before the driver ever runs.

Known driver tolerance kept: DATE vs midnight-TIMESTAMP compare equal
(``fn_date`` / ``fn_interval`` were driver-green in r2 despite that
formatting diff).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def _cell(v):
    # pandas nulls: None, NaN, NaT — all canonicalize to None so an
    # int64-with-nulls→float64 column still value-matches on non-nulls.
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return None
        # deliberately NOT normalizing -0.0: the driver may hash reprs,
        # so a -0.0 vs 0.0 divergence must fail here first (queries are
        # responsible for emitting an unsigned zero on both engines).
        return ("f", repr(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is None and v.time() == datetime.time(0):
            return ("d", v.date().isoformat())
        return ("t", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _cell(x)) for k, x in v.items())))
    return ("s", str(v))


def canon_pdf(pdf: pd.DataFrame):
    """Sort columns by name, type-tag every cell, sort rows — the
    order-insensitive canonical form the driver hashes."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort(key=repr)
    return cols, rows


def _assert_scalar_columns(pdf: pd.DataFrame, key: str, side: str) -> None:
    """Reject list/ndarray/dict-typed result columns.

    The driver's canonicalizer pandas-sorts the result
    (``sort_values`` → ``Categorical`` → ``factorize``), which raises
    ``TypeError: unhashable type`` on any list-typed column — the oracle
    never runs and the key lands as ERR (round 7: ``pipeline_embed_batch``).
    This mirror's own repr-sort handles lists fine, so the contract must
    be enforced explicitly: flatten arrays before returning
    (``engine.canon.joined`` / ``ARRAY_TO_STRING``) or explode them.
    """
    for col in pdf.columns:
        s = pdf[col]
        if s.dtype == object:
            for v in s:
                if isinstance(v, (list, tuple, np.ndarray, dict, set)):
                    raise AssertionError(
                        f"{key}: {side} column {col!r} holds "
                        f"{type(v).__name__}-typed cells — the driver's "
                        "pandas sort_values canonicalizer cannot hash "
                        "them (r7 pipeline_embed_batch ERR). Flatten with "
                        "engine.canon.joined / ARRAY_TO_STRING or explode."
                    )


def compare(spark_df, duck_con, sql, key=""):
    spdf = spark_df.toPandas()
    dpdf = duck_con.execute(sql).df()
    _assert_scalar_columns(spdf, key, "spark")
    _assert_scalar_columns(dpdf, key, "oracle")

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{key}: column mismatch spark={sorted(spdf.columns)} "
        f"duck={sorted(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{key}: row count spark={len(spdf)} duck={len(dpdf)}"
    )
    _, sc = canon_pdf(spdf)
    _, dc = canon_pdf(dpdf)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch, first diffs: {diffs}")
