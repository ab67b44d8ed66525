"""Error hierarchy for the python-dtl-spark engine.

Mirrors the failure modes of the reference implementation
(/root/reference/src/dtl/ast_to_ir.py raises bare ``Exception("compilation
error")`` / ``Exception("Type error")``) with a structured hierarchy.
"""

from __future__ import annotations


class DtlError(Exception):
    """Base class for all engine errors."""


class DtlSyntaxError(DtlError):
    """Raised by the lexer/parser on malformed source."""

    def __init__(self, message: str, *, lineno: int | None = None, column: int | None = None):
        self.lineno = lineno
        self.column = column
        if lineno is not None:
            message = f"{message} (line {lineno}, column {column})"
        super().__init__(message)


class DtlNameError(DtlError):
    """Unresolvable table/column name, or a name that cannot be derived.

    Reference: "compilation error" at ast_to_ir.py:117-142 (unresolved
    column) and "no name could be derived" at ast_to_ir.py:93-102.
    """


class DtlTypeError(DtlError):
    """Strict type check failed.

    The reference engine performs no coercion whatsoever: arithmetic and
    comparison require exactly equal dtypes on both sides
    (ast_to_ir.py:209-213 et al.).  Spark would silently coerce, so the
    analyzer raises this *before* building the Spark plan.
    """


class DtlTransactionError(DtlError):
    """BEGIN/COMMIT/ROLLBACK misuse: nested BEGIN, COMMIT/ROLLBACK with
    no open block, or a script ending inside an open block."""


class DtlOrderError(DtlError):
    """An order-dependent operator (DISTINCT CONSECUTIVE, GROUP CONSECUTIVE
    BY) was used while the engine is running in unordered (scale) mode."""
