"""DTL logical type system mapped onto Spark SQL types.

The reference defines dtypes BOOL, INT32, INT64, DOUBLE, TEXT, BYTES,
INDEX, TIMESTAMP, DATE (/root/reference/src/dtl/ir.py:11-20) and infers
them from Arrow on import (ast_to_ir.py:636-650).  Anything outside that
map is a hard error in the reference; here unknown Spark types degrade to
``OTHER`` — such columns can be selected/projected/exported but not used
in strict-typed expressions (extension for e.g. ``array<float>``
embedding columns).
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T


class DType(enum.Enum):
    BOOL = "BOOL"
    INT32 = "INT32"
    INT64 = "INT64"
    DOUBLE = "DOUBLE"
    TEXT = "TEXT"
    BYTES = "BYTES"
    TIMESTAMP = "TIMESTAMP"
    DATE = "DATE"
    INDEX = "INDEX"  # internal row-id arrays; LongType physically
    OTHER = "OTHER"  # extension: passthrough for nested/array/map types

    def __str__(self) -> str:  # nicer error messages
        return self.value


NUMERIC_DTYPES = frozenset({DType.INT32, DType.INT64, DType.DOUBLE})
ORDERED_DTYPES = frozenset(
    {DType.INT32, DType.INT64, DType.DOUBLE, DType.TEXT, DType.TIMESTAMP, DType.DATE}
)

_SPARK_TO_DTL: dict[type, DType] = {
    T.BooleanType: DType.BOOL,
    T.IntegerType: DType.INT32,
    T.LongType: DType.INT64,
    T.FloatType: DType.DOUBLE,  # reference maps float32 -> DOUBLE (ast_to_ir.py:644)
    T.DoubleType: DType.DOUBLE,
    T.StringType: DType.TEXT,
    T.BinaryType: DType.BYTES,
    T.TimestampType: DType.TIMESTAMP,
    T.TimestampNTZType: DType.TIMESTAMP,
    T.DateType: DType.DATE,
    T.ShortType: DType.INT32,
    T.ByteType: DType.INT32,
}

_DTL_TO_SPARK: dict[DType, T.DataType] = {
    DType.BOOL: T.BooleanType(),
    DType.INT32: T.IntegerType(),
    DType.INT64: T.LongType(),
    DType.DOUBLE: T.DoubleType(),
    DType.TEXT: T.StringType(),
    DType.BYTES: T.BinaryType(),
    DType.TIMESTAMP: T.TimestampType(),
    DType.DATE: T.DateType(),
    DType.INDEX: T.LongType(),
}


def dtype_from_spark(spark_type: T.DataType) -> DType:
    """Infer the DTL dtype for a Spark type (reference: ast_to_ir.py:636-650)."""
    return _SPARK_TO_DTL.get(type(spark_type), DType.OTHER)


def spark_type_for(dtype: DType) -> T.DataType:
    if dtype in (DType.OTHER,):
        raise ValueError("OTHER has no canonical Spark type")
    return _DTL_TO_SPARK[dtype]
