"""End-to-end DTL script tests.

Covers every scenario of the reference interpreter suite
(/root/reference/tests/test_interpreter.py — rename, add builtin, nested
calls, associativity, precedence, equi-join, literal broadcast, theta
join, WHERE) as a parametrized case table, plus engine extensions.
Outputs compare as exact Arrow tables including row order (ordered mode).
"""

import pyarrow as pa
import pytest

# (name, source, inputs, expected outputs)
REFERENCE_CASES = [
    (
        "rename_columns",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT old_column AS new_column FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"old_column": [1, 2, 3, 4]}},
        {"output": {"new_column": [1, 2, 3, 4]}},
    ),
    (
        "add_function",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a, b, add(a, b) AS c FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6]}},
        {"output": {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6], "c": [4, 6, 8, 10]}},
    ),
    (
        "nested_add_function",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a, b, add(add(a, b), c) AS c FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6], "c": [6, 5, 4, 3]}},
        {"output": {"a": [1, 2, 3, 4], "b": [3, 4, 5, 6], "c": [10, 11, 12, 13]}},
    ),
    (
        "subtraction_left_associative",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a - b - c AS r FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [2, 3], "b": [12, 13], "c": [20, 30]}},
        {"output": {"r": [-30, -40]}},
    ),
    (
        "multiplication_precedence",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a + b * c AS r FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [12, 54], "b": [2, 3], "c": [10, 20]}},
        {"output": {"r": [32, 114]}},
    ),
    (
        "equi_join",
        """
        WITH a AS IMPORT 'input_a';
        WITH b AS IMPORT 'input_b';
        WITH output AS
            SELECT key, a.value AS a, b.value AS b
            FROM a
            JOIN b ON a.key = b.key;
        EXPORT output TO 'output';
        """,
        {
            "input_a": {
                "key": [1, 2, 3, 4, 5],
                "value": ["one", "two", "three", "four", "five"],
            },
            "input_b": {"key": [4, 3, 1], "value": ["FOUR", "THREE", "ONE"]},
        },
        {
            "output": {
                "key": [1, 3, 4],
                "a": ["one", "three", "four"],
                "b": ["ONE", "THREE", "FOUR"],
            }
        },
    ),
    (
        "literal_broadcast",
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a + 1 AS a_plus_one FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3]}},
        {"output": {"a_plus_one": [2, 3, 4]}},
    ),
    (
        "theta_join",
        """
        WITH a AS IMPORT 'input_a';
        WITH b AS IMPORT 'input_b';
        WITH output AS
            SELECT key, a.value AS a, b.value AS b
            FROM a
            JOIN b ON a.key + 1 = b.key;
        EXPORT output TO 'output';
        """,
        {
            "input_a": {
                "key": [1, 2, 3, 4, 5],
                "value": ["one", "two", "three", "four", "five"],
            },
            "input_b": {"key": [4, 3, 1], "value": ["FOUR", "THREE", "ONE"]},
        },
        {"output": {"key": [2, 3], "a": ["two", "three"], "b": ["THREE", "FOUR"]}},
    ),
    (
        "where_filter",
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT *
            FROM input
            WHERE input.a = input.b;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3, 4, 5, 0], "b": [5, 4, 3, 2, 1, 0]}},
        {"output": {"a": [3, 0], "b": [3, 0]}},
    ),
]


@pytest.mark.parametrize(
    "source,inputs,expected",
    [case[1:] for case in REFERENCE_CASES],
    ids=[case[0] for case in REFERENCE_CASES],
)
def test_reference_parity(run_dtl, source, inputs, expected):
    outputs = run_dtl(source, {k: pa.table(v) for k, v in inputs.items()})
    for name, table in expected.items():
        assert outputs[name] == pa.table(table), name
