"""Builtin scalar and aggregate function registry.

The reference registry contains exactly one function, ``add(a, b)``
(/root/reference/src/dtl/ast_to_ir.py:195-222); everything else here is
an extension behind the same ``FunctionCallExpression`` surface
(reference nodes.py:89-91), per SURVEY.md §2.5/§7 M4.

Every builtin carries a strict signature check (the engine performs no
implicit coercion, matching reference semantics) and a builder producing
a JVM-side Column expression — no Python UDFs anywhere in this registry,
so every function stays inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from python_dtl_spark.errors import DtlTypeError
from python_dtl_spark.types import NUMERIC_DTYPES, ORDERED_DTYPES, DType


@dataclass(frozen=True)
class Builtin:
    name: str
    check: Callable[[list[DType]], DType]  # arg dtypes -> result dtype (raises)
    build: Callable[..., Column]
    # argument positions that must be literal constants in the source and
    # are passed to ``build`` as raw Python values (e.g. a round scale,
    # which Spark requires as a plain int, not a Column)
    literal_args: frozenset = frozenset()


SCALARS: dict[str, Builtin] = {}
AGGREGATES: dict[str, Builtin] = {}


def _scalar(name: str, check, build, literal_args: frozenset = frozenset()) -> None:
    SCALARS[name] = Builtin(name=name, check=check, build=build, literal_args=literal_args)


def _aggregate(name: str, check, build) -> None:
    AGGREGATES[name] = Builtin(name=name, check=check, build=build)


def _fail(name: str, dtypes: list[DType]) -> DtlTypeError:
    sig = ", ".join(str(d) for d in dtypes)
    return DtlTypeError(f"Type error: no overload of {name}({sig})")


def _arity(name: str, dtypes: list[DType], n: int) -> None:
    if len(dtypes) != n:
        raise DtlTypeError(f"Type error: {name} takes {n} argument(s), got {len(dtypes)}")


def _check_numeric_pair(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 2)
        if dtypes[0] != dtypes[1] or dtypes[0] not in NUMERIC_DTYPES:
            raise _fail(name, dtypes)
        return dtypes[0]

    return check


def _check_numeric_unary(name: str, result: DType | None = None):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] not in NUMERIC_DTYPES:
            raise _fail(name, dtypes)
        return result or dtypes[0]

    return check


def _check_double_unary(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] not in NUMERIC_DTYPES:
            raise _fail(name, dtypes)
        return DType.DOUBLE

    return check


def _check_text_unary(name: str, result: DType = DType.TEXT):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] != DType.TEXT:
            raise _fail(name, dtypes)
        return result

    return check


def _check_exact(name: str, args: list[DType], result: DType):
    def check(dtypes: list[DType]) -> DType:
        if dtypes != args:
            raise _fail(name, dtypes)
        return result

    return check


# --- arithmetic / math -----------------------------------------------------

# reference parity: add(a, b) == a + b (ast_to_ir.py:216-218)
_scalar("add", _check_numeric_pair("add"), lambda a, b: a + b)
_scalar("sub", _check_numeric_pair("sub"), lambda a, b: a - b)
_scalar("mul", _check_numeric_pair("mul"), lambda a, b: a * b)
_scalar("abs", _check_numeric_unary("abs"), F.abs)
_scalar("sign", _check_numeric_unary("sign", DType.DOUBLE), lambda x: F.signum(x))
_scalar("ceil", _check_double_unary("ceil"), lambda x: F.ceil(x).cast("double"))
_scalar("floor", _check_double_unary("floor"), lambda x: F.floor(x).cast("double"))
# .cast("double"): Spark's round(x, 0) returns the INPUT type for
# integral columns, which would silently diverge from the declared
# DOUBLE result dtype (ceil/floor cast for the same reason)
_scalar("round", _check_double_unary("round"), lambda x: F.round(x, 0).cast("double"))
_scalar(
    "round_to",
    _check_exact("round_to", [DType.DOUBLE, DType.INT64], DType.DOUBLE),
    lambda x, scale: F.round(x, scale),
    literal_args=frozenset({1}),
)
_scalar("sqrt", _check_double_unary("sqrt"), F.sqrt)
_scalar("exp", _check_double_unary("exp"), F.exp)
_scalar("ln", _check_double_unary("ln"), F.log)
_scalar("log10", _check_double_unary("log10"), F.log10)
_scalar("log2", _check_double_unary("log2"), F.log2)
_scalar("sin", _check_double_unary("sin"), F.sin)
_scalar("cos", _check_double_unary("cos"), F.cos)
_scalar("tan", _check_double_unary("tan"), F.tan)


def _check_pow(dtypes: list[DType]) -> DType:
    _arity("pow", dtypes, 2)
    if any(d not in NUMERIC_DTYPES for d in dtypes):
        raise _fail("pow", dtypes)
    return DType.DOUBLE


_scalar("pow", _check_pow, F.pow)


def _check_greatest(name: str):
    def check(dtypes: list[DType]) -> DType:
        if len(dtypes) < 2 or len(set(dtypes)) != 1 or dtypes[0] not in ORDERED_DTYPES:
            raise _fail(name, dtypes)
        return dtypes[0]

    return check


_scalar("greatest", _check_greatest("greatest"), F.greatest)
_scalar("least", _check_greatest("least"), F.least)

# --- string ----------------------------------------------------------------

_scalar("upper", _check_text_unary("upper"), F.upper)
_scalar("lower", _check_text_unary("lower"), F.lower)
_scalar("trim", _check_text_unary("trim"), F.trim)
_scalar("ltrim", _check_text_unary("ltrim"), F.ltrim)
_scalar("rtrim", _check_text_unary("rtrim"), F.rtrim)
_scalar("reverse", _check_text_unary("reverse"), F.reverse)
_scalar("length", _check_text_unary("length", DType.INT64), lambda s: F.length(s).cast("long"))
_scalar(
    "substr",
    _check_exact("substr", [DType.TEXT, DType.INT64, DType.INT64], DType.TEXT),
    lambda s, p, l: F.substring(s, p.cast("int"), l.cast("int")),
)


def _check_concat(dtypes: list[DType]) -> DType:
    # all-TEXT or all-BYTES (Spark's concat supports binary natively);
    # mixing the two is a type error — encode/decode to cross
    if dtypes and all(d == DType.TEXT for d in dtypes):
        return DType.TEXT
    if dtypes and all(d == DType.BYTES for d in dtypes):
        return DType.BYTES
    raise _fail("concat", dtypes)


_scalar("concat", _check_concat, F.concat)
_scalar(
    "replace",
    _check_exact("replace", [DType.TEXT, DType.TEXT, DType.TEXT], DType.TEXT),
    lambda s, a, b: F.replace(s, a, b),
)
_scalar(
    "contains",
    _check_exact("contains", [DType.TEXT, DType.TEXT], DType.BOOL),
    lambda s, sub: s.contains(sub),
)
_scalar(
    "starts_with",
    _check_exact("starts_with", [DType.TEXT, DType.TEXT], DType.BOOL),
    lambda s, p: s.startswith(p),
)
_scalar(
    "ends_with",
    _check_exact("ends_with", [DType.TEXT, DType.TEXT], DType.BOOL),
    lambda s, p: s.endswith(p),
)
_scalar(
    "regexp_matches",
    _check_exact("regexp_matches", [DType.TEXT, DType.TEXT], DType.BOOL),
    lambda s, p: s.rlike(p),
)
_scalar("md5", _check_text_unary("md5"), lambda s: F.md5(s.cast("binary")))

# --- bytes -------------------------------------------------------------------
# The BYTES dtype companions of the string library (bytes literals are
# the round-18 grammar completion — reference nodes.py:42-44 declares
# the node, its eval crashes at eval.py:119; columns were already
# end-to-end).  Strict same-dtype discipline like everything else: no
# implicit TEXT<->BYTES coercion, cross the boundary with encode/decode.


def _check_bytes_unary(name: str, result: DType = DType.BYTES):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] != DType.BYTES:
            raise _fail(name, dtypes)
        return result

    return check


_scalar(
    "encode",
    _check_text_unary("encode", DType.BYTES),
    lambda s: F.encode(s, "UTF-8"),
)
_scalar(
    "decode",
    _check_bytes_unary("decode", DType.TEXT),
    lambda b: F.decode(b, "UTF-8"),
)
_scalar("hex", _check_bytes_unary("hex", DType.TEXT), F.hex)
_scalar(
    "octet_length",
    _check_bytes_unary("octet_length", DType.INT64),
    lambda b: F.octet_length(b).cast("long"),
)

# --- temporal --------------------------------------------------------------


def _check_temporal_part(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] not in (DType.TIMESTAMP, DType.DATE):
            raise _fail(name, dtypes)
        return DType.INT64

    return check


_scalar("year", _check_temporal_part("year"), lambda x: F.year(x).cast("long"))
_scalar("month", _check_temporal_part("month"), lambda x: F.month(x).cast("long"))
_scalar("day", _check_temporal_part("day"), lambda x: F.day(x).cast("long"))
_scalar("hour", _check_temporal_part("hour"), lambda x: F.hour(x).cast("long"))
_scalar("minute", _check_temporal_part("minute"), lambda x: F.minute(x).cast("long"))
_scalar("second", _check_temporal_part("second"), lambda x: F.second(x).cast("long"))


def _check_temporal_pair(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 2)
        if dtypes[0] != dtypes[1] or dtypes[0] not in (DType.TIMESTAMP, DType.DATE):
            raise _fail(name, dtypes)
        return DType.INT64

    return check


# Whole calendar days end - start, both truncated to dates first (the
# SQL DATEDIFF convention, matching DuckDB date_diff('day', ...)) —
# strict `+`/`-` typing has no timestamp arithmetic, so lateness-window
# predicates (TPC-H q21 shape) need a named function.
_scalar(
    "datediff_days",
    _check_temporal_pair("datediff_days"),
    lambda a, b: F.datediff(a, b).cast("long"),
)


def _check_trunc(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] != DType.TIMESTAMP:
            raise _fail(name, dtypes)
        return DType.TIMESTAMP

    return check


for _part in ("year", "month", "week", "day", "hour", "minute"):
    _scalar(
        f"trunc_{_part}",
        _check_trunc(f"trunc_{_part}"),
        (lambda p: lambda ts: F.date_trunc(p, ts))(_part),
    )
_scalar(
    "timestamp",
    _check_exact("timestamp", [DType.TEXT], DType.TIMESTAMP),
    lambda s: F.to_timestamp(s),
)
_scalar("date", _check_exact("date", [DType.TEXT], DType.DATE), lambda s: F.to_date(s))

# --- casts (explicit escape hatch from strict typing) ----------------------


def _check_cast(name: str, allowed: frozenset[DType], result: DType):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] not in allowed:
            raise _fail(name, dtypes)
        return result

    return check


_CASTABLE = frozenset(
    {DType.BOOL, DType.INT32, DType.INT64, DType.DOUBLE, DType.TEXT}
)
_scalar("int64", _check_cast("int64", _CASTABLE, DType.INT64), lambda x: x.cast("long"))
_scalar("int32", _check_cast("int32", _CASTABLE, DType.INT32), lambda x: x.cast("int"))
_scalar(
    "double", _check_cast("double", _CASTABLE, DType.DOUBLE), lambda x: x.cast("double")
)
_scalar(
    "text",
    _check_cast(
        "text",
        frozenset({DType.BOOL, DType.INT32, DType.INT64, DType.TEXT}),
        DType.TEXT,
    ),
    lambda x: x.cast("string"),
)

# --- null handling / conditionals ------------------------------------------


def _check_coalesce(dtypes: list[DType]) -> DType:
    if len(dtypes) < 2 or len(set(dtypes)) != 1:
        raise _fail("coalesce", dtypes)
    return dtypes[0]


_scalar("coalesce", _check_coalesce, F.coalesce)


def _check_if(dtypes: list[DType]) -> DType:
    _arity("if", dtypes, 3)
    if dtypes[0] != DType.BOOL or dtypes[1] != dtypes[2]:
        raise _fail("if", dtypes)
    return dtypes[1]


_scalar("if", _check_if, lambda c, a, b: F.when(c, a).otherwise(b))


def _check_is_null(dtypes: list[DType]) -> DType:
    _arity("is_null", dtypes, 1)
    return DType.BOOL


_scalar("is_null", _check_is_null, lambda x: x.isNull())
_scalar("is_not_null", _check_is_null, lambda x: x.isNotNull())

# --- aggregates (extension: GROUP BY is dead code in the reference,
# --- ast_to_ir.py:619-620; the aggregate set is ours to define) ------------


def _check_count_star(dtypes: list[DType]) -> DType:
    if len(dtypes) > 1:
        raise _fail("count", dtypes)
    return DType.INT64


_aggregate(
    "count",
    _check_count_star,
    lambda *cols: F.count(cols[0]).cast("long") if cols else F.count(F.lit(1)).cast("long"),
)


def _check_count_distinct(dtypes: list[DType]) -> DType:
    if len(dtypes) != 1:
        raise _fail("count_distinct", dtypes)
    return DType.INT64


_aggregate(
    "count_distinct", _check_count_distinct, lambda c: F.count_distinct(c).cast("long")
)


def _check_approx_count_distinct(dtypes: list[DType]) -> DType:
    if len(dtypes) != 1:
        raise _fail("approx_count_distinct", dtypes)
    return DType.INT64


# HyperLogLog++ sketch: the 100 TB way to count distincts — exact
# count_distinct forces every distinct value through one shuffle,
# while the sketch aggregates partial registers map-side (fixed-size
# state per group regardless of cardinality).
_aggregate(
    "approx_count_distinct",
    _check_approx_count_distinct,
    lambda c: F.approx_count_distinct(c).cast("long"),
)


def _check_sum(dtypes: list[DType]) -> DType:
    _arity("sum", dtypes, 1)
    if dtypes[0] not in NUMERIC_DTYPES:
        raise _fail("sum", dtypes)
    return DType.INT64 if dtypes[0] in (DType.INT32, DType.INT64) else DType.DOUBLE


_aggregate("sum", _check_sum, F.sum)
_aggregate("avg", _check_double_unary("avg"), F.avg)
_aggregate("stddev", _check_double_unary("stddev"), F.stddev_samp)
_aggregate("var", _check_double_unary("var"), F.var_samp)


def _check_minmax(name: str):
    def check(dtypes: list[DType]) -> DType:
        _arity(name, dtypes, 1)
        if dtypes[0] not in ORDERED_DTYPES:
            raise _fail(name, dtypes)
        return dtypes[0]

    return check


_aggregate("min", _check_minmax("min"), F.min)
_aggregate("max", _check_minmax("max"), F.max)


def is_aggregate_call(name: str) -> bool:
    return name in AGGREGATES
