"""Cross-engine canonicalization helpers (SURVEY.md §7.3 float policy).

The driver value-hashes Spark results against DuckDB. Spark's
``round(x, n)`` computes the exact decimal expansion of the double and
rounds HALF_UP; DuckDB rounds doubles by scaling (``std::round(x*10^n) /
10^n``). The two disagree whenever ``x*10^n`` lands on the other side of
a .5 boundary than x's decimal expansion — common for derived prices.

``dround`` makes Spark perform DuckDB's sequence: scale in double
arithmetic, round at scale 0 (HALF_UP == half-away-from-zero, matching
std::round for every representable value), unscale. Both engines then
execute bit-identical IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 0) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    if scale == 0:
        return F.round(col, 0)
    p = F.lit(float(10**scale))
    return F.round(col * p, 0) / p


def round_half_away(x):
    """DuckDB ROUND (std::round: half away from zero) for PYTHON-side
    values — the driver-side mirror of the dround contract for the few
    keys that finish their arithmetic off-cluster (channel-sized Markov
    chains, pandas cogroup cents). Exact fractional-part comparison, no
    ``floor(x + 0.5)``: the +0.5 addition rounds up for doubles within
    one ulp below a .5 boundary where std::round does not. ``x -
    floor(x)`` is exact for finite doubles (Sterbenz), so the comparison
    is the true tie test. Accepts scalars and numpy/pandas arrays;
    returns float64 (cast at the call site). A pandas Series comes back
    as a Series with ITS ORIGINAL INDEX (np.where would drop it, and an
    alignment-dependent caller would silently misalign — ADVICE r8)."""
    import numpy as np

    ax = np.abs(x)
    f = np.floor(ax)
    out = np.copysign(np.where(ax - f >= 0.5, f + 1.0, f), x)
    try:
        import pandas as pd

        if isinstance(x, pd.Series):
            return pd.Series(out, index=x.index, name=x.name)
    except ImportError:  # pragma: no cover
        pass
    return out


def joined(arr: Column, sep: str = ",") -> Column:
    """Array → delimiter-joined string (elements cast to string first).

    Query outputs must be scalar-typed: the driver's canonicalizer
    pandas-sorts result columns, and Python lists are unhashable there —
    an array-typed output column crashes the correctness harness. Join
    on the Spark side, ARRAY_TO_STRING/STRING_AGG on the oracle side.
    """
    return F.concat_ws(sep, F.transform(arr, lambda x: x.cast("string")))


def floordiv_sql(expr: str, d: int) -> Column:
    """Floor division on longs in exact integer arithmetic, from a SQL
    expression string.

    Spark's ``div`` truncates toward zero while DuckDB's ``//`` floors —
    they disagree on negative values (pre-1970 epochs). ``pmod`` makes
    the numerator an exact multiple of ``d``, where truncation == floor;
    staying in long ``div`` arithmetic avoids the double-precision loss
    that ``F.floor(col / d)`` would hit for epoch-nanos magnitudes
    (~1e18 > 2^53).
    """
    return F.expr(f"(({expr}) - pmod(({expr}), {d})) div {d}")


#: the portable string→int TRY-cast accepted set: trimmed optional-sign
#: digits. Bare TRY_CAST disagrees across engines outside it ('12.5' /
#: '0x1F' / '1e2' / tab-wrapped — DuckDB rounds, parses hex and
#: scientific; Spark ANSI rejects), and Spark's ANSI try_cast
#: raises-and-catches PER ROW on non-matching strings (~14× the guarded
#: form). One regex, used verbatim by both engines.
PORTABLE_INT_RE = "^[+-]?[0-9]+$"


def portable_try_int(col: Column | str) -> Column:
    """Spark side of the portable TRY int cast (see PORTABLE_INT_RE)."""
    if isinstance(col, str):
        col = F.col(col)
    t = F.trim(col)
    return F.when(t.rlike(PORTABLE_INT_RE), t.try_cast("int"))


def portable_try_int_sql(col: str) -> str:
    """DuckDB side of the portable TRY int cast — same accepted set."""
    return (
        f"CASE WHEN regexp_matches(TRIM({col}), '{PORTABLE_INT_RE}') "
        f"THEN TRY_CAST(TRIM({col}) AS INTEGER) END"
    )
