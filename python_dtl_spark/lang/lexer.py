"""Regex-driven tokenizer for the DTL language.

Covers the token set of the reference lexer
(/root/reference/src/dtl/lexer.py:5-22 keyword map, :57-292 scanner) and
adds the keywords the reference declares but never wires in (USING, GROUP,
BY — absent from its keyword map, making those grammar rules unreachable)
plus AND/OR/NOT word-forms alongside the reference's ``& | !`` tokens.

Deliberately different implementation strategy from the reference's
hand-rolled character scanner: a single compiled alternation regex.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from python_dtl_spark.errors import DtlSyntaxError

KEYWORDS = {
    "WITH",
    "AS",
    "IMPORT",
    "EXPORT",
    "TO",
    "SELECT",
    "DISTINCT",
    "CONSECUTIVE",
    "FROM",
    "JOIN",
    "ON",
    "USING",
    "WHERE",
    "GROUP",
    "BY",
    "HAVING",
    "ORDER",
    "ASC",
    "DESC",
    "LIMIT",
    "UNION",
    "INTERSECT",
    "EXCEPT",
    "ALL",
    "LEFT",
    "RIGHT",
    "FULL",
    "OUTER",
    "CROSS",
    "SEMI",
    "ANTI",
    "TRUE",
    "FALSE",
    "AND",
    "OR",
    "NOT",
    "BEGIN",
    "UPDATE",
    # NOTE: the mutation-statement grammar also uses DELETE, INSERT,
    # SET, INTO, COMMIT and ROLLBACK, but those are SOFT keywords —
    # recognized by value at their grammar positions in the parser,
    # lexed as plain NAMEs.  Only BEGIN and UPDATE are reserved by the
    # reference (tokens.py:54-59 defines exactly the Begin and Update
    # token classes); the rest were never reserved words in DTL, and
    # reserving them here would break existing scripts using them as
    # column or table names (e.g. ``SELECT set, delete FROM audit``).
}


@dataclass(frozen=True)
class Token:
    kind: str  # keyword (upper), or: NAME QNAME INT FLOAT STRING
    #            BYTESTRING (text = RAW inner body; the parser calls
    #            unescape_bytes — bytes don't fit a str field) OP EOF
    text: str
    lineno: int
    column: int

    def __repr__(self) -> str:
        return f"Token({self.kind}, {self.text!r}, {self.lineno}:{self.column})"


_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<line_comment>//[^\n]*)
    | (?P<block_comment>/\*(?:[^*]|\*(?!/))*\*/)
    | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
    | (?P<int>\d+)
    | (?P<bytestring>[bB]'(?:\\.|[^'\\])*')
    | (?P<string>'(?:\\.|[^'\\])*')
    | (?P<qname>"(?:\\.|[^"\\])*")
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op><=|>=|!=|==|[-+*/%=<>!&|(),;.])
    """,
    re.VERBOSE | re.DOTALL,
)

_ESCAPES = {"n": "\n", "t": "\t", "\\": "\\", "'": "'", '"': '"'}


def unescape_bytes(body: str, lineno: int = 1, column: int = 1) -> bytes:
    """Decode the inner body of a ``b'...'`` literal to bytes.

    Same escapes as strings plus ``\\xHH`` for arbitrary byte values;
    bare characters must be ASCII (the Python/Rust bytes-literal rule —
    a non-ASCII character has no single unambiguous byte encoding, so
    it must be spelled ``\\xHH``).  The reference declares ByteString
    tokens and a Bytes AST node but never lexes them
    (/root/reference/src/dtl/tokens.py:39, nodes.py:42-44 — and its
    eval crashes on the nonexistent ``pa.bytes()``, eval.py:119), so
    the surface syntax here is this repo's choice, promoted to a real
    feature like the rest of grammar tier 2.

    ``lineno``/``column`` are the TOKEN's start; errors report the
    offending escape's own position (``column + 2 + i`` — the ``b'``
    prefix plus the offset within the body; bytes literals cannot span
    lines, so only the column shifts).
    """
    out = bytearray()
    i = 0

    def _err_col() -> int:
        return column + 2 + i

    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in ("x", "X"):
                hexpart = body[i + 2 : i + 4]
                if len(hexpart) != 2 or any(
                    c not in "0123456789abcdefABCDEF" for c in hexpart
                ):
                    raise DtlSyntaxError(
                        r"invalid \xHH escape in bytes literal",
                        lineno=lineno,
                        column=_err_col(),
                    )
                out.append(int(hexpart, 16))
                i += 4
                continue
            esc = _ESCAPES.get(nxt, nxt)
            if any(ord(c) > 127 for c in esc):
                raise DtlSyntaxError(
                    f"non-ASCII escape {nxt!r} in bytes literal; spell "
                    r"it as \xHH escapes",
                    lineno=lineno,
                    column=_err_col(),
                )
            out.extend(esc.encode("ascii"))
            i += 2
            continue
        if ord(ch) > 127:
            raise DtlSyntaxError(
                f"non-ASCII character {ch!r} in bytes literal; spell it "
                r"as \xHH escapes",
                lineno=lineno,
                column=_err_col(),
            )
        out.append(ord(ch))
        i += 1
    return bytes(out)


def _unescape(body: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def tokenize(source: str) -> list[Token]:
    """Tokenize ``source``, dropping whitespace and comments.

    Returns a list terminated by an EOF token.
    """
    tokens: list[Token] = []
    pos = 0
    lineno = 1
    line_start = 0
    n = len(source)
    while pos < n:
        if source.startswith("/*", pos) and "*/" not in source[pos:]:
            # without this check the opener lexes as '/' '*' operator
            # tokens and the comment BODY parses as code — the user
            # gets a syntax error pointing somewhere inside their own
            # comment instead of at the unterminated opener
            raise DtlSyntaxError(
                "unterminated block comment",
                lineno=lineno,
                column=pos - line_start + 1,
            )
        m = _TOKEN_RE.match(source, pos)
        if m is None:
            raise DtlSyntaxError(
                f"unexpected character {source[pos]!r}",
                lineno=lineno,
                column=pos - line_start + 1,
            )
        kind = m.lastgroup
        text = m.group()
        column = pos - line_start + 1
        if kind in ("ws", "line_comment", "block_comment"):
            pass
        elif kind == "name":
            upper = text.upper()
            if upper in KEYWORDS:
                tokens.append(Token(upper, text, lineno, column))
            else:
                tokens.append(Token("NAME", text, lineno, column))
        elif kind == "bytestring":
            tokens.append(Token("BYTESTRING", text[2:-1], lineno, column))
        elif kind == "string":
            tokens.append(Token("STRING", _unescape(text[1:-1]), lineno, column))
        elif kind == "qname":
            tokens.append(Token("QNAME", _unescape(text[1:-1]), lineno, column))
        elif kind == "int":
            tokens.append(Token("INT", text, lineno, column))
        elif kind == "float":
            tokens.append(Token("FLOAT", text, lineno, column))
        else:  # op
            tokens.append(Token("OP", text, lineno, column))
        # advance line tracking through the consumed text
        nl = text.count("\n")
        if nl:
            lineno += nl
            line_start = pos + text.rfind("\n") + 1
        pos = m.end()
    tokens.append(Token("EOF", "", lineno, n - line_start + 1))
    return tokens
