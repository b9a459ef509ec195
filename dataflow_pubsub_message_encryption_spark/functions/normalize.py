"""Output-normalization discipline shared by every registered query.

The driver hash-compares Spark results against DuckDB oracles
(order-insensitive value hash, columns sorted by name), so every query must
emit bit-identical values from both engines. Hazards and the rules that
neutralize them (SURVEY §5):

- floats        -> ``money()`` (2dp) for money/values, ``sim()`` (6dp) for
                   similarities/transcendentals, applied in BOTH engines.
- timestamps    -> never emitted raw: ``ts_str()`` / ``date_str()`` format
                   to strings; DuckDB mirrors via ``strftime`` (``DUCK_TS``/
                   ``DUCK_DATE`` templates). Sidesteps ns-vs-us precision
                   and tz-vs-ntz schema drift entirely.
- row order     -> the hash is order-insensitive, but LIMIT/top-k queries
                   must pick a deterministic SET: every ORDER BY carries a
                   unique tie-break key.
- int widths    -> DuckDB ``sum(int)`` is HUGEINT; oracles cast aggregates
                   explicitly (``CAST(... AS BIGINT)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
DATE_FMT_SPARK = "yyyy-MM-dd"
DATE_FMT_DUCK = "%Y-%m-%d"


def dec4(c: Column | str) -> Column:
    """Cast a *clean* money double (verified <=4dp decimal in the fixtures)
    to DECIMAL(18,4). All money arithmetic/aggregation happens in decimal:
    exact in both engines, so rounding is bit-deterministic — double
    arithmetic diverges at .xx5 boundaries because Spark rounds the
    shortest decimal repr (HALF_UP on BigDecimal) while DuckDB rounds via
    float multiply (observed: 49574.4249999... -> .42 vs .43).
    Mirror: ``CAST(x AS DECIMAL(18,4))``."""
    return (c if isinstance(c, Column) else F.col(c)).cast("decimal(18,4)")


def money(c: Column | str) -> Column:
    """Round a money/value expression to 2dp and emit DOUBLE. Feed it
    decimal-typed expressions (see ``dec4``) for bit-determinism; a raw
    double is only safe when both engines hold the identical double.
    Mirror: ``CAST(round(x, 2) AS DOUBLE)``."""
    return F.round(c if isinstance(c, Column) else F.col(c), 2).cast("double")


def sim(c: Column | str) -> Column:
    """Round a similarity/transcendental double to 6dp (mirror: ``round(x, 6)``)."""
    return F.round(c if isinstance(c, Column) else F.col(c), 6)


def ts_str(c: Column | str) -> Column:
    """Timestamp -> 'YYYY-MM-DD HH:MM:SS.ffffff' string."""
    return F.date_format(c if isinstance(c, Column) else F.col(c), TS_FMT_SPARK)


def date_str(c: Column | str) -> Column:
    """Timestamp/date -> 'YYYY-MM-DD' string."""
    return F.date_format(c if isinstance(c, Column) else F.col(c), DATE_FMT_SPARK)


def duck_ts(expr: str) -> str:
    return f"strftime({expr}, '{TS_FMT_DUCK}')"


def duck_date(expr: str) -> str:
    return f"strftime({expr}, '{DATE_FMT_DUCK}')"
