"""DTL language frontend: lexer, AST, parser."""

from python_dtl_spark.lang.lexer import tokenize
from python_dtl_spark.lang.parser import parse

__all__ = ["tokenize", "parse"]
