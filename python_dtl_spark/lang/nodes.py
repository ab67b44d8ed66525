"""AST node definitions for the DTL language.

Shape follows the reference AST (/root/reference/src/dtl/nodes.py) in
spirit — statements, table expressions, column bindings, expressions —
but is a fresh design: nodes compare structurally (``eq=True``) with
source locations excluded from comparison, which the GROUP BY analyzer
relies on to match select items against grouping expressions.

Extensions over the reference grammar (which parses but never executes
most of these — SURVEY.md §2): comparison operators, boolean operators,
DISTINCT [CONSECUTIVE], GROUP [CONSECUTIVE] BY, JOIN USING, outer/semi/
anti/cross joins, ORDER BY, LIMIT, and set operations.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Node:
    pass


# --- expressions -----------------------------------------------------------


@dataclass(frozen=True)
class Expression(Node):
    pass


@dataclass(frozen=True)
class Literal(Expression):
    value: object
    kind: str  # "int" | "float" | "string" | "bool" | "bytes"


@dataclass(frozen=True)
class ColumnRef(Expression):
    """Qualified (``t.c``) or unqualified (``c``) column reference
    (reference: nodes.py:50-80)."""

    namespace: str | None
    name: str


@dataclass(frozen=True)
class FunctionCall(Expression):
    name: str
    args: tuple[Expression, ...]


@dataclass(frozen=True)
class BinaryOp(Expression):
    op: str  # + - * / % = != < <= > >= & |
    left: Expression
    right: Expression


@dataclass(frozen=True)
class UnaryOp(Expression):
    op: str  # ! -
    operand: Expression


# --- column bindings -------------------------------------------------------


@dataclass(frozen=True)
class ColumnBinding(Node):
    pass


@dataclass(frozen=True)
class Wildcard(ColumnBinding):
    """``*`` — every column in scope, namespaces stripped
    (reference: nodes.py:183-185)."""


@dataclass(frozen=True)
class Aliased(ColumnBinding):
    expression: Expression
    name: str


@dataclass(frozen=True)
class Implicit(ColumnBinding):
    """Binding whose output name derives from the expression; only column
    refs can self-name (reference: ast_to_ir.py:93-102)."""

    expression: Expression


# --- table expressions -----------------------------------------------------


@dataclass(frozen=True)
class TableExpression(Node):
    pass


@dataclass(frozen=True)
class ImportExpression(TableExpression):
    location: str


@dataclass(frozen=True)
class TableRef(TableExpression):
    name: str


@dataclass(frozen=True)
class Source(Node):
    """A FROM/JOIN operand: a named binding with optional alias."""

    name: str
    alias: str | None


@dataclass(frozen=True)
class JoinOn(Node):
    predicate: Expression


@dataclass(frozen=True)
class JoinUsing(Node):
    columns: tuple[str, ...]


@dataclass(frozen=True)
class JoinClause(Node):
    how: str  # inner left right full cross semi anti
    source: Source
    constraint: JoinOn | JoinUsing | None  # None only for cross


@dataclass(frozen=True)
class GroupBy(Node):
    consecutive: bool
    expressions: tuple[Expression, ...]


@dataclass(frozen=True)
class OrderItem(Node):
    expression: Expression
    descending: bool


@dataclass(frozen=True)
class SelectExpression(TableExpression):
    distinct: str | None  # None | "all" | "consecutive"
    columns: tuple[ColumnBinding, ...]
    source: Source
    joins: tuple[JoinClause, ...]
    where: Expression | None
    group_by: GroupBy | None
    having: Expression | None
    order_by: tuple[OrderItem, ...]
    limit: int | None


@dataclass(frozen=True)
class SetExpression(TableExpression):
    op: str  # union | union_all | intersect | except
    left: TableExpression
    right: TableExpression


# --- statements ------------------------------------------------------------


@dataclass(frozen=True)
class Statement(Node):
    pass


@dataclass(frozen=True)
class WithStatement(Statement):
    name: str
    expression: TableExpression


@dataclass(frozen=True)
class ExportStatement(Statement):
    expression: TableExpression
    location: str


@dataclass(frozen=True)
class UpdateStatement(Statement):
    """``UPDATE name SET col = expr [, ...] [WHERE pred];``

    The reference reserves the keyword and declares an *empty* stub node
    (reference nodes.py:332-334, no parser production, no evaluator) —
    this extension gives it copy-on-write semantics: the binding is
    replaced by a new table whose SET columns take the new value on rows
    matching WHERE (all rows when absent).  All SET expressions read the
    *old* row (SQL simultaneous-assignment semantics).
    """

    target: str
    assignments: tuple[tuple[str, Expression], ...]
    where: Expression | None


@dataclass(frozen=True)
class DeleteStatement(Statement):
    """``DELETE FROM name [WHERE pred];`` — copy-on-write filter; rows
    where the predicate is TRUE are removed (NULL keeps the row, like
    SQL DELETE).  Reference stub: nodes.py:337-339."""

    target: str
    where: Expression | None


@dataclass(frozen=True)
class InsertStatement(Statement):
    """``INSERT INTO name <table expression>;`` — appends rows with an
    exact schema match (same column names and dtypes, same order — the
    set-operation rule).  Reference stub: nodes.py:342-344."""

    target: str
    expression: TableExpression


@dataclass(frozen=True)
class BeginStatement(Statement):
    """``BEGIN ['note'];`` — opens a transaction block closed by
    ``COMMIT;`` or ``ROLLBACK;``.  The reference's stub carries a text
    payload (nodes.py:353-354) surfaced here as the optional note."""

    note: str | None


@dataclass(frozen=True)
class CommitStatement(Statement):
    pass


@dataclass(frozen=True)
class RollbackStatement(Statement):
    pass


@dataclass(frozen=True)
class Script(Node):
    statements: tuple[Statement, ...] = field(default_factory=tuple)
