"""Recursive-descent / Pratt parser for the DTL language.

The reference builds LALR tables at import time from declarative
productions (/root/reference/src/dtl/parser.py:69-320,
parser_generator.py).  The language is small and LL-friendly, so this is
a hand-written recursive-descent parser with Pratt-style precedence
climbing for expressions.

Operator precedence (loosest → tightest), matching the reference where it
defines one (``* /`` over ``+ -``, parser.py:183-187) and standard SQL
elsewhere:

    OR/|  <  AND/&  <  NOT/!  <  = != < <= > >=  <  + -  <  * / %  <  unary -
"""

from __future__ import annotations

from python_dtl_spark.errors import DtlSyntaxError
from python_dtl_spark.lang import nodes as n
from python_dtl_spark.lang.lexer import Token, tokenize, unescape_bytes

_CMP_OPS = {"=", "==", "!=", "<", "<=", ">", ">="}
_JOIN_STARTERS = {"JOIN", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI"}


class _Parser:
    def __init__(self, tokens: list[Token]):
        self._tokens = tokens
        self._pos = 0

    # -- primitives --------------------------------------------------------

    def _peek(self, ahead: int = 0) -> Token:
        return self._tokens[min(self._pos + ahead, len(self._tokens) - 1)]

    def _advance(self) -> Token:
        tok = self._tokens[self._pos]
        if tok.kind != "EOF":
            self._pos += 1
        return tok

    def _check(self, kind: str, text: str | None = None) -> bool:
        tok = self._peek()
        return tok.kind == kind and (text is None or tok.text == text)

    def _match(self, kind: str, text: str | None = None) -> Token | None:
        if self._check(kind, text):
            return self._advance()
        return None

    def _check_soft(self, word: str) -> bool:
        """A SOFT keyword: a plain NAME token whose value matches
        case-insensitively (SET/INTO/COMMIT/ROLLBACK are not reserved —
        see lexer.py — so they stay usable as column/table names)."""
        tok = self._peek()
        return tok.kind == "NAME" and tok.text.lower() == word

    def _match_soft(self, word: str) -> Token | None:
        if self._check_soft(word):
            return self._advance()
        return None

    def _expect_soft(self, word: str) -> Token:
        tok = self._peek()
        if not self._check_soft(word):
            raise DtlSyntaxError(
                f"expected {word.upper()!r}, found {tok.text or tok.kind!r}",
                lineno=tok.lineno,
                column=tok.column,
            )
        return self._advance()

    def _expect(self, kind: str, text: str | None = None) -> Token:
        tok = self._peek()
        if not self._check(kind, text):
            want = text or kind
            raise DtlSyntaxError(
                f"expected {want!r}, found {tok.text or tok.kind!r}",
                lineno=tok.lineno,
                column=tok.column,
            )
        return self._advance()

    def _name(self) -> str:
        tok = self._peek()
        if tok.kind in ("NAME", "QNAME"):
            return self._advance().text
        raise DtlSyntaxError(
            f"expected name, found {tok.text or tok.kind!r}",
            lineno=tok.lineno,
            column=tok.column,
        )

    # -- script / statements -----------------------------------------------

    def parse_script(self) -> n.Script:
        statements: list[n.Statement] = []
        while not self._check("EOF"):
            statements.append(self.parse_statement())
        return n.Script(statements=tuple(statements))

    def parse_statement(self) -> n.Statement:
        if self._check("WITH"):
            self._advance()
            name = self._name()
            self._expect("AS")
            expr = self.parse_table_expression()
            self._expect("OP", ";")
            return n.WithStatement(name=name, expression=expr)
        if self._check("EXPORT"):
            self._advance()
            expr = self.parse_table_expression()
            self._expect("TO")
            location = self._expect("STRING").text
            self._expect("OP", ";")
            return n.ExportStatement(expression=expr, location=location)
        # Mutation statements: the reference reserves these keywords and
        # declares empty stub AST nodes but never grew parser productions
        # or an evaluator (reference tokens.py:54-59, nodes.py:331-354).
        # This extension completes them with copy-on-write semantics over
        # script bindings (see compiler.Engine.run_script).
        if self._match("UPDATE"):
            target = self._name()
            self._expect_soft("set")
            assignments = [self._assignment()]
            while self._match("OP", ","):
                assignments.append(self._assignment())
            where = self.parse_expression() if self._match("WHERE") else None
            self._expect("OP", ";")
            return n.UpdateStatement(
                target=target, assignments=tuple(assignments), where=where
            )
        # DELETE/INSERT are soft (statement position is unambiguous — a
        # statement never starts with a bare NAME — so they stay usable
        # as column/table names; only BEGIN/UPDATE are reference-reserved)
        if self._match_soft("delete"):
            self._expect("FROM")
            target = self._name()
            where = self.parse_expression() if self._match("WHERE") else None
            self._expect("OP", ";")
            return n.DeleteStatement(target=target, where=where)
        if self._match_soft("insert"):
            self._expect_soft("into")
            target = self._name()
            expr = self.parse_table_expression()
            self._expect("OP", ";")
            return n.InsertStatement(target=target, expression=expr)
        if self._match("BEGIN"):
            note_tok = self._match("STRING")
            self._expect("OP", ";")
            return n.BeginStatement(note=note_tok.text if note_tok else None)
        if self._match_soft("commit"):
            self._expect("OP", ";")
            return n.CommitStatement()
        if self._match_soft("rollback"):
            self._expect("OP", ";")
            return n.RollbackStatement()
        tok = self._peek()
        raise DtlSyntaxError(
            f"expected statement, found {tok.text or tok.kind!r}",
            lineno=tok.lineno,
            column=tok.column,
        )

    def _assignment(self) -> tuple[str, "n.Expression"]:
        """``col = expr`` inside UPDATE ... SET (plain column name only)."""
        tok = self._peek()
        if tok.kind != "NAME":
            raise DtlSyntaxError(
                f"expected column name in SET, found {tok.text or tok.kind!r}",
                lineno=tok.lineno,
                column=tok.column,
            )
        name = self._advance().text
        self._expect("OP", "=")
        return name, self.parse_expression()

    # -- table expressions --------------------------------------------------

    def parse_table_expression(self) -> n.TableExpression:
        left = self._table_term()
        while True:
            if self._match("UNION"):
                op = "union_all" if self._match("ALL") else "union"
            elif self._match("INTERSECT"):
                op = "intersect"
            elif self._match("EXCEPT"):
                op = "except"
            else:
                return left
            right = self._table_term()
            left = n.SetExpression(op=op, left=left, right=right)

    def _table_term(self) -> n.TableExpression:
        if self._match("IMPORT"):
            return n.ImportExpression(location=self._expect("STRING").text)
        if self._check("SELECT"):
            return self._select()
        if self._match("OP", "("):
            inner = self.parse_table_expression()
            self._expect("OP", ")")
            return inner
        return n.TableRef(name=self._name())

    def _select(self) -> n.SelectExpression:
        self._expect("SELECT")
        distinct: str | None = None
        if self._match("DISTINCT"):
            distinct = "consecutive" if self._match("CONSECUTIVE") else "all"
        columns = [self._column_binding()]
        while self._match("OP", ","):
            columns.append(self._column_binding())
        self._expect("FROM")
        source = self._source()
        joins: list[n.JoinClause] = []
        while self._peek().kind in _JOIN_STARTERS:
            joins.append(self._join_clause())
        where = None
        if self._match("WHERE"):
            where = self.parse_expression()
        group_by = None
        if self._match("GROUP"):
            consecutive = bool(self._match("CONSECUTIVE"))
            self._expect("BY")
            exprs = [self.parse_expression()]
            while self._match("OP", ","):
                exprs.append(self.parse_expression())
            group_by = n.GroupBy(consecutive=consecutive, expressions=tuple(exprs))
        having = None
        if self._match("HAVING"):
            having = self.parse_expression()
        order_by: list[n.OrderItem] = []
        if self._match("ORDER"):
            self._expect("BY")
            order_by.append(self._order_item())
            while self._match("OP", ","):
                order_by.append(self._order_item())
        limit = None
        if self._match("LIMIT"):
            limit = int(self._expect("INT").text)
        return n.SelectExpression(
            distinct=distinct,
            columns=tuple(columns),
            source=source,
            joins=tuple(joins),
            where=where,
            group_by=group_by,
            having=having,
            order_by=tuple(order_by),
            limit=limit,
        )

    def _order_item(self) -> n.OrderItem:
        expr = self.parse_expression()
        descending = False
        if self._match("DESC"):
            descending = True
        else:
            self._match("ASC")
        return n.OrderItem(expression=expr, descending=descending)

    def _source(self) -> n.Source:
        name = self._name()
        alias = None
        if self._match("AS"):
            alias = self._name()
        return n.Source(name=name, alias=alias)

    def _join_clause(self) -> n.JoinClause:
        how = "inner"
        if self._match("LEFT"):
            self._match("OUTER")
            how = "left"
        elif self._match("RIGHT"):
            self._match("OUTER")
            how = "right"
        elif self._match("FULL"):
            self._match("OUTER")
            how = "full"
        elif self._match("CROSS"):
            how = "cross"
        elif self._match("SEMI"):
            how = "semi"
        elif self._match("ANTI"):
            how = "anti"
        self._expect("JOIN")
        source = self._source()
        constraint: n.JoinOn | n.JoinUsing | None = None
        if self._match("ON"):
            if how == "cross":
                tok = self._peek()
                raise DtlSyntaxError(
                    "CROSS JOIN takes no ON clause", lineno=tok.lineno, column=tok.column
                )
            constraint = n.JoinOn(predicate=self.parse_expression())
        elif self._match("USING"):
            if how == "cross":
                tok = self._peek()
                # a USING here was previously parsed and then silently
                # DISCARDED by the compiler — the query returned the
                # full cross product instead of the equi-join the user
                # wrote.  Reject it like the ON guard above.
                raise DtlSyntaxError(
                    "CROSS JOIN takes no USING clause",
                    lineno=tok.lineno,
                    column=tok.column,
                )
            self._expect("OP", "(")
            cols = [self._name()]
            while self._match("OP", ","):
                cols.append(self._name())
            self._expect("OP", ")")
            constraint = n.JoinUsing(columns=tuple(cols))
        elif how != "cross":
            tok = self._peek()
            raise DtlSyntaxError(
                "expected ON or USING after JOIN", lineno=tok.lineno, column=tok.column
            )
        return n.JoinClause(how=how, source=source, constraint=constraint)

    def _column_binding(self) -> n.ColumnBinding:
        if self._match("OP", "*"):
            return n.Wildcard()
        expr = self.parse_expression()
        if self._match("AS"):
            return n.Aliased(expression=expr, name=self._name())
        return n.Implicit(expression=expr)

    # -- expressions (precedence climbing) -----------------------------------

    def parse_expression(self) -> n.Expression:
        return self._or_expr()

    def _or_expr(self) -> n.Expression:
        left = self._and_expr()
        while self._check("OP", "|") or self._check("OR"):
            self._advance()
            left = n.BinaryOp(op="|", left=left, right=self._and_expr())
        return left

    def _and_expr(self) -> n.Expression:
        left = self._not_expr()
        while self._check("OP", "&") or self._check("AND"):
            self._advance()
            left = n.BinaryOp(op="&", left=left, right=self._not_expr())
        return left

    def _not_expr(self) -> n.Expression:
        if self._check("OP", "!") and not (
            self._peek(1).kind == "OP" and self._peek(1).text == "="
        ):
            self._advance()
            return n.UnaryOp(op="!", operand=self._not_expr())
        if self._match("NOT"):
            return n.UnaryOp(op="!", operand=self._not_expr())
        return self._cmp_expr()

    def _cmp_expr(self) -> n.Expression:
        left = self._add_expr()
        tok = self._peek()
        if tok.kind == "OP" and tok.text in _CMP_OPS:
            self._advance()
            op = "=" if tok.text == "==" else tok.text
            right = self._add_expr()
            return n.BinaryOp(op=op, left=left, right=right)
        return left

    def _add_expr(self) -> n.Expression:
        left = self._mul_expr()
        while self._check("OP", "+") or self._check("OP", "-"):
            op = self._advance().text
            left = n.BinaryOp(op=op, left=left, right=self._mul_expr())
        return left

    def _mul_expr(self) -> n.Expression:
        left = self._unary_expr()
        while (
            self._check("OP", "*") or self._check("OP", "/") or self._check("OP", "%")
        ):
            op = self._advance().text
            left = n.BinaryOp(op=op, left=left, right=self._unary_expr())
        return left

    def _unary_expr(self) -> n.Expression:
        if self._match("OP", "-"):
            return n.UnaryOp(op="-", operand=self._unary_expr())
        return self._primary()

    def _primary(self) -> n.Expression:
        tok = self._peek()
        if tok.kind == "INT":
            self._advance()
            return n.Literal(value=int(tok.text), kind="int")
        if tok.kind == "FLOAT":
            self._advance()
            return n.Literal(value=float(tok.text), kind="float")
        if tok.kind == "STRING":
            self._advance()
            return n.Literal(value=tok.text, kind="string")
        if tok.kind == "BYTESTRING":
            self._advance()
            return n.Literal(
                value=unescape_bytes(tok.text, tok.lineno, tok.column),
                kind="bytes",
            )
        if tok.kind == "TRUE":
            self._advance()
            return n.Literal(value=True, kind="bool")
        if tok.kind == "FALSE":
            self._advance()
            return n.Literal(value=False, kind="bool")
        if tok.kind == "OP" and tok.text == "(":
            self._advance()
            inner = self.parse_expression()
            self._expect("OP", ")")
            return inner
        if tok.kind in ("NAME", "QNAME"):
            self._advance()
            # function call
            if self._check("OP", "("):
                self._advance()
                args: list[n.Expression] = []
                # count(*) sugar: treated as zero-arg count()
                if self._check("OP", "*") and self._peek(1).text == ")":
                    self._advance()
                elif not self._check("OP", ")"):
                    args.append(self.parse_expression())
                    while self._match("OP", ","):
                        args.append(self.parse_expression())
                self._expect("OP", ")")
                return n.FunctionCall(name=tok.text, args=tuple(args))
            # qualified column ref
            if self._check("OP", "."):
                self._advance()
                member = self._name()
                return n.ColumnRef(namespace=tok.text, name=member)
            return n.ColumnRef(namespace=None, name=tok.text)
        raise DtlSyntaxError(
            f"expected expression, found {tok.text or tok.kind!r}",
            lineno=tok.lineno,
            column=tok.column,
        )


def parse(source: str) -> n.Script:
    """Parse DTL source text into a Script AST."""
    return _Parser(tokenize(source)).parse_script()
