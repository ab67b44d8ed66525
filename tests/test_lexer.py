import pytest

from python_dtl_spark.errors import DtlSyntaxError
from python_dtl_spark.lang.lexer import tokenize


def kinds(source):
    return [t.kind for t in tokenize(source)]


def texts(source):
    return [t.text for t in tokenize(source)[:-1]]


def test_keywords_case_insensitive():
    assert kinds("select Select SELECT")[:-1] == ["SELECT", "SELECT", "SELECT"]


def test_names_and_keywords():
    assert kinds("WITH foo AS IMPORT 'bar';") == [
        "WITH",
        "NAME",
        "AS",
        "IMPORT",
        "STRING",
        "OP",
        "EOF",
    ]


def test_numbers():
    toks = tokenize("1 23 4.5 6e3 7.5e-2")
    assert [t.kind for t in toks[:-1]] == ["INT", "INT", "FLOAT", "FLOAT", "FLOAT"]


def test_string_escape():
    toks = tokenize(r"'it\'s'")
    assert toks[0].kind == "STRING"
    assert toks[0].text == "it's"


def test_quoted_name():
    toks = tokenize('"weird name"')
    assert toks[0].kind == "QNAME"
    assert toks[0].text == "weird name"


def test_comments_dropped():
    src = """
    // line comment
    SELECT /* block
    comment */ a
    """
    assert kinds(src) == ["SELECT", "NAME", "EOF"]


def test_operators():
    assert texts("a <= b >= c != d = e < f > g") == [
        "a", "<=", "b", ">=", "c", "!=", "d", "=", "e", "<", "f", ">", "g",
    ]


def test_line_numbers():
    toks = tokenize("a\nb\n  c")
    assert [(t.lineno, t.column) for t in toks[:-1]] == [(1, 1), (2, 1), (3, 3)]


def test_unexpected_character():
    with pytest.raises(DtlSyntaxError):
        tokenize("a @ b")
