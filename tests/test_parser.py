import pytest

from python_dtl_spark.errors import DtlSyntaxError
from python_dtl_spark.lang import nodes as n
from python_dtl_spark.lang.parser import parse


def only_stmt(source):
    script = parse(source)
    assert len(script.statements) == 1
    return script.statements[0]


def test_import_statement():
    stmt = only_stmt("WITH t AS IMPORT 'data';")
    assert stmt == n.WithStatement(name="t", expression=n.ImportExpression(location="data"))


def test_export_statement():
    stmt = only_stmt("EXPORT t TO 'out';")
    assert stmt == n.ExportStatement(expression=n.TableRef(name="t"), location="out")


def test_select_simple():
    stmt = only_stmt("WITH o AS SELECT a, t.b AS c FROM t;")
    sel = stmt.expression
    assert sel.columns == (
        n.Implicit(expression=n.ColumnRef(namespace=None, name="a")),
        n.Aliased(expression=n.ColumnRef(namespace="t", name="b"), name="c"),
    )
    assert sel.source == n.Source(name="t", alias=None)


def test_precedence_mul_over_add():
    stmt = only_stmt("WITH o AS SELECT a + b * c AS r FROM t;")
    expr = stmt.expression.columns[0].expression
    assert expr == n.BinaryOp(
        op="+",
        left=n.ColumnRef(namespace=None, name="a"),
        right=n.BinaryOp(
            op="*",
            left=n.ColumnRef(namespace=None, name="b"),
            right=n.ColumnRef(namespace=None, name="c"),
        ),
    )


def test_left_associativity():
    stmt = only_stmt("WITH o AS SELECT a - b - c AS r FROM t;")
    expr = stmt.expression.columns[0].expression
    assert expr == n.BinaryOp(
        op="-",
        left=n.BinaryOp(
            op="-",
            left=n.ColumnRef(namespace=None, name="a"),
            right=n.ColumnRef(namespace=None, name="b"),
        ),
        right=n.ColumnRef(namespace=None, name="c"),
    )


def test_comparison_and_logic_precedence():
    stmt = only_stmt("WITH o AS SELECT * FROM t WHERE a = 1 & b < 2 | !c;")
    pred = stmt.expression.where
    assert pred.op == "|"
    assert pred.left.op == "&"
    assert pred.right == n.UnaryOp(op="!", operand=n.ColumnRef(namespace=None, name="c"))


def test_join_on():
    stmt = only_stmt("WITH o AS SELECT * FROM a JOIN b ON a.k = b.k;")
    (join,) = stmt.expression.joins
    assert join.how == "inner"
    assert join.source == n.Source(name="b", alias=None)
    assert isinstance(join.constraint, n.JoinOn)


def test_join_using_and_types():
    stmt = only_stmt(
        "WITH o AS SELECT * FROM a LEFT JOIN b USING (k1, k2) CROSS JOIN c;"
    )
    j1, j2 = stmt.expression.joins
    assert j1.how == "left"
    assert j1.constraint == n.JoinUsing(columns=("k1", "k2"))
    assert j2.how == "cross"
    assert j2.constraint is None


def test_distinct_variants():
    assert only_stmt("WITH o AS SELECT DISTINCT a FROM t;").expression.distinct == "all"
    assert (
        only_stmt("WITH o AS SELECT DISTINCT CONSECUTIVE a FROM t;").expression.distinct
        == "consecutive"
    )


def test_group_by():
    sel = only_stmt(
        "WITH o AS SELECT k, sum(v) AS s FROM t GROUP BY k HAVING sum(v) > 10 "
        "ORDER BY s DESC LIMIT 5;"
    ).expression
    assert sel.group_by == n.GroupBy(
        consecutive=False, expressions=(n.ColumnRef(namespace=None, name="k"),)
    )
    assert sel.having is not None
    assert sel.order_by[0].descending is True
    assert sel.limit == 5


def test_group_consecutive_by():
    sel = only_stmt("WITH o AS SELECT k, count() AS c FROM t GROUP CONSECUTIVE BY k;").expression
    assert sel.group_by.consecutive is True


def test_count_star_sugar():
    sel = only_stmt("WITH o AS SELECT count(*) AS c FROM t;").expression
    assert sel.columns[0].expression == n.FunctionCall(name="count", args=())


def test_set_operations():
    stmt = only_stmt("WITH o AS SELECT a FROM t UNION ALL SELECT a FROM u;")
    assert isinstance(stmt.expression, n.SetExpression)
    assert stmt.expression.op == "union_all"


def test_not_keyword_and_bang_equivalent():
    a = only_stmt("WITH o AS SELECT * FROM t WHERE NOT x;")
    b = only_stmt("WITH o AS SELECT * FROM t WHERE !x;")
    assert a.expression.where == b.expression.where


def test_missing_semicolon():
    with pytest.raises(DtlSyntaxError):
        parse("WITH t AS IMPORT 'x'")


def test_cross_join_rejects_on():
    with pytest.raises(DtlSyntaxError):
        parse("WITH o AS SELECT * FROM a CROSS JOIN b ON a.k = b.k;")


def test_mutation_statement_productions():
    # reference reserves UPDATE/DELETE/INSERT/BEGIN with empty stub AST
    # nodes (reference nodes.py:331-354) and no productions; this repo
    # completes them as an extension (copy-on-write semantics)
    s = parse(
        "UPDATE t SET a = a + 1, b = 2 WHERE a < 5;"
        "DELETE FROM t WHERE a = 1;"
        "DELETE FROM t;"
        "INSERT INTO t SELECT a, b FROM u;"
        "BEGIN 'note'; COMMIT; BEGIN; ROLLBACK;"
    )
    kinds = [type(st).__name__ for st in s.statements]
    assert kinds == [
        "UpdateStatement",
        "DeleteStatement",
        "DeleteStatement",
        "InsertStatement",
        "BeginStatement",
        "CommitStatement",
        "BeginStatement",
        "RollbackStatement",
    ]
    upd = s.statements[0]
    assert upd.target == "t"
    assert [name for name, _ in upd.assignments] == ["a", "b"]
    assert upd.where is not None
    assert s.statements[2].where is None
    assert s.statements[4].note == "note"
    assert s.statements[6].note is None


def test_mutation_statement_syntax_errors():
    for bad in (
        "UPDATE t a = 1;",  # missing SET
        "UPDATE t SET 1 = a;",  # assignment target must be a name
        "DELETE t WHERE a = 1;",  # missing FROM
        "INSERT t SELECT a FROM u;",  # missing INTO
        "BEGIN",  # missing semicolon
    ):
        with pytest.raises(DtlSyntaxError):
            parse(bad)


def test_soft_keywords_usable_as_names():
    """SET/INTO/COMMIT/ROLLBACK are soft keywords: reserved only at
    their mutation-grammar positions, still valid column/table names
    (the reference never reserved them; a hard reservation would break
    existing scripts)."""
    from python_dtl_spark.lang.parser import parse

    stmts = parse(
        "WITH into AS IMPORT 'into';\n"
        "WITH o AS SELECT set, commit, rollback FROM into;\n"
        "EXPORT o TO 'o';\n"
    )
    assert len(stmts.statements) == 3

    # and the mutation grammar still recognizes them positionally
    stmts2 = parse(
        "UPDATE t SET a = 1 WHERE b = 2;\n"
        "INSERT INTO t SELECT a, b FROM u;\n"
        "BEGIN; COMMIT;\n"
        "BEGIN; ROLLBACK;\n"
    )
    assert len(stmts2.statements) == 6


def test_delete_insert_soft_keywords_usable_as_names():
    """DELETE/INSERT are soft too: the reference reserves only Begin
    and Update (tokens.py:54-59), and a statement never starts with a
    bare NAME, so recognizing them by value at statement position keeps
    them available as column/table names."""
    from python_dtl_spark.lang.parser import parse

    stmts = parse(
        "WITH delete AS IMPORT 'audit';\n"
        "WITH o AS SELECT delete, insert FROM delete;\n"
        "EXPORT o TO 'o';\n"
        "DELETE FROM o WHERE insert = 1;\n"
        "INSERT INTO o SELECT delete FROM delete;\n"
    )
    assert len(stmts.statements) == 5


def test_bytes_literal_production():
    """b'..' lexes to a bytes Literal: standard escapes, \\xHH for
    arbitrary bytes, case-insensitive prefix; the reference declares
    the Bytes node but never lexes it (tokens.py:39, nodes.py:42-44),
    so this is the promoted-to-real form."""
    stmt = only_stmt("WITH o AS SELECT b'a\\x00\\xff\\t\\'' AS c FROM t;")
    lit = stmt.expression.columns[0].expression
    assert lit == n.Literal(value=b"a\x00\xff\t'", kind="bytes")
    up = only_stmt("WITH o AS SELECT B'Up' AS c FROM t;")
    assert up.expression.columns[0].expression.value == b"Up"
    # empty bytes are legal
    assert only_stmt(
        "WITH o AS SELECT b'' AS c FROM t;"
    ).expression.columns[0].expression.value == b""


def test_bytes_literal_errors():
    """Non-ASCII raw characters and malformed \\x escapes fail at parse
    time with a DtlSyntaxError, not a silent mis-encode."""
    with pytest.raises(DtlSyntaxError, match="non-ASCII"):
        parse("WITH o AS SELECT b'é' AS c FROM t;")
    with pytest.raises(DtlSyntaxError, match="xHH"):
        parse("WITH o AS SELECT b'\\xZ9' AS c FROM t;")
    with pytest.raises(DtlSyntaxError, match="xHH"):
        parse("WITH o AS SELECT b'\\x4' AS c FROM t;")
    # the reported column is the OFFENDING ESCAPE's position, not the
    # token start (r18 advisor): src.index points at the backslash
    src = "WITH o AS SELECT b'abcd\\xZ9' AS c FROM t;"
    with pytest.raises(DtlSyntaxError) as exc:
        parse(src)
    assert exc.value.column == src.index("\\xZ9") + 1  # 1-based columns
    # a bare b away from a quote is still a plain NAME
    stmt = only_stmt("WITH o AS SELECT b FROM t;")
    assert stmt.expression.columns[0].expression == n.ColumnRef(
        namespace=None, name="b"
    )
