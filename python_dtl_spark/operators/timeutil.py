"""Timestamp → numeric conversion that works on every Spark time type.

Spark 4 reads pyarrow-written parquet timestamps (``isAdjustedToUTC=
false``) as ``TIMESTAMP_NTZ``, and NTZ supports neither ``cast("double")``
nor ``unix_micros`` directly — both raise ``DATATYPE_MISMATCH``.  The
lossless bridge is ``cast("timestamp")``: NTZ → LTZ reinterprets the
wall-clock in the session timezone, which ``session.get_spark`` pins to
UTC, so the epoch value equals what DuckDB's ``epoch_us`` computes for
the same parquet cell.  Every operator that needs numeric time goes
through these helpers instead of casting ad hoc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TIME_TYPES = (T.TimestampType, T.TimestampNTZType, T.DateType)


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since the epoch for TIMESTAMP / TIMESTAMP_NTZ / DATE
    columns (UTC session timezone makes NTZ→LTZ a reinterpretation, not
    a shift)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(col: Column | str) -> Column:
    """Fractional epoch seconds (double) — the value ``cast("double")``
    used to produce for LTZ timestamps before Spark read parquet as NTZ."""
    return epoch_micros(col) / F.lit(1_000_000.0)


def numeric_axis(dtype: T.DataType, col: Column) -> Column:
    """``col`` (which must carry values of ``dtype``) as a double on a
    shared axis: timestamps/dates become fractional epoch seconds,
    numerics cast directly.  The dtype is passed explicitly so staged
    expressions (struct fields, lagged copies) can reuse the dispatch of
    the source column they were derived from."""
    if isinstance(dtype, _TIME_TYPES):
        return epoch_seconds(col)
    return col.cast("double")


def as_number(df: DataFrame, col_name: str) -> Column:
    """``col_name`` as a double on a shared axis: timestamps/dates become
    fractional epoch seconds, numerics cast directly.  Used by operators
    (as-of tolerance, range-join bucketing, event deltas) whose key may
    be either."""
    return numeric_axis(df.schema[col_name].dataType, F.col(col_name))
