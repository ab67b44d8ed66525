"""Tests for features the reference parses-but-never-executes (tier 2/3,
SURVEY.md §2) promoted to real features, plus engine extensions."""

import pyarrow as pa
import pytest

from python_dtl_spark.errors import DtlNameError, DtlTypeError


def run1(run_dtl, body, data, output="output"):
    return run_dtl(body, {k: pa.table(v) for k, v in data.items()})[output]


def test_comparisons(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a FROM input WHERE a >= 2 & a < 5;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3, 4, 5, 6]}},
    )
    assert out == pa.table({"a": [2, 3, 4]})


def test_not_equal_and_or_not(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a FROM input WHERE !(a != 1) | a = 4;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3, 4]}},
    )
    assert out == pa.table({"a": [1, 4]})


def test_distinct(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT DISTINCT a, b FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 1, 2, 2, 1], "b": ["x", "x", "y", "y", "z"]}},
    )
    # first occurrence kept, import order preserved
    assert out == pa.table({"a": [1, 2, 1], "b": ["x", "y", "z"]})


def test_distinct_consecutive(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT DISTINCT CONSECUTIVE a FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 1, 2, 2, 2, 1, 3, 3]}},
    )
    assert out == pa.table({"a": [1, 2, 1, 3]})


def test_group_by(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT k, sum(v) AS total, count() AS n
            FROM input GROUP BY k ORDER BY k;
        EXPORT output TO 'output';
        """,
        {"input": {"k": [1, 2, 1, 2, 3], "v": [10, 20, 30, 40, 50]}},
    )
    assert out == pa.table({"k": [1, 2, 3], "total": [40, 60, 50], "n": [2, 2, 1]})


def test_group_by_having_order_limit(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT k, count() AS n FROM input
            GROUP BY k HAVING count() > 1 ORDER BY n DESC, k LIMIT 2;
        EXPORT output TO 'output';
        """,
        {"input": {"k": [1, 1, 1, 2, 2, 3, 4, 4]}},
    )
    assert out == pa.table({"k": [1, 2], "n": [3, 2]})


def test_group_by_expression_in_post_agg_arithmetic(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT k, sum(v) / count() AS mean FROM input GROUP BY k ORDER BY k;
        EXPORT output TO 'output';
        """,
        {"input": {"k": [1, 1, 2], "v": [10, 20, 7]}},
    )
    assert out == pa.table({"k": [1, 2], "mean": [15, 7]})


def test_global_aggregation_without_group_by(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT count() AS n, sum(v) AS s, max(v) AS mx FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"v": [5, 1, 9, 3]}},
    )
    assert out == pa.table({"n": [4], "s": [18], "mx": [9]})


def test_group_consecutive_by(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT k, sum(v) AS total FROM input GROUP CONSECUTIVE BY k;
        EXPORT output TO 'output';
        """,
        {"input": {"k": [1, 1, 2, 2, 1, 1], "v": [1, 2, 3, 4, 5, 6]}},
    )
    # runs: [1,1] [2,2] [1,1] — adjacency grouping, not global
    assert out == pa.table({"k": [1, 2, 1], "total": [3, 7, 11]})


def test_join_using(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH output AS SELECT k, x, y FROM a JOIN b USING (k);
        EXPORT output TO 'output';
        """,
        {
            "a": {"k": [1, 2, 3], "x": ["p", "q", "r"]},
            "b": {"k": [2, 3, 4], "y": ["Q", "R", "S"]},
        },
    )
    assert out == pa.table({"k": [2, 3], "x": ["q", "r"], "y": ["Q", "R"]})


def test_left_join(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH output AS SELECT a.k AS k, y FROM a LEFT JOIN b ON a.k = b.k;
        EXPORT output TO 'output';
        """,
        {"a": {"k": [1, 2, 3]}, "b": {"k": [2], "y": ["two"]}},
    )
    assert out == pa.table({"k": [1, 2, 3], "y": [None, "two", None]})


def test_semi_and_anti_join(run_dtl):
    data = {"a": {"k": [1, 2, 3, 4]}, "b": {"k": [2, 4, 4]}}
    semi = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH output AS SELECT k FROM a SEMI JOIN b ON a.k = b.k;
        EXPORT output TO 'output';
        """,
        data,
    )
    assert semi == pa.table({"k": [2, 4]})
    anti = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH output AS SELECT k FROM a ANTI JOIN b ON a.k = b.k;
        EXPORT output TO 'output';
        """,
        data,
    )
    assert anti == pa.table({"k": [1, 3]})


def test_cross_join(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH output AS SELECT x, y FROM a CROSS JOIN b;
        EXPORT output TO 'output';
        """,
        {"a": {"x": [1, 2]}, "b": {"y": ["u", "v"]}},
    )
    # left-major deterministic order (reference eval.py:168-171)
    assert out == pa.table({"x": [1, 1, 2, 2], "y": ["u", "v", "u", "v"]})


def test_union_all_and_except(run_dtl):
    src = """
    WITH a AS IMPORT 'a';
    WITH b AS IMPORT 'b';
    WITH u AS SELECT k FROM a UNION ALL SELECT k FROM b;
    WITH e AS SELECT k FROM a EXCEPT SELECT k FROM b;
    EXPORT u TO 'u';
    EXPORT e TO 'e';
    """
    outs = run_dtl(
        src,
        {
            "a": pa.table({"k": [1, 2, 3]}),
            "b": pa.table({"k": [3, 4]}),
        },
    )
    assert sorted(outs["u"]["k"].to_pylist()) == [1, 2, 3, 3, 4]
    assert sorted(outs["e"]["k"].to_pylist()) == [1, 2]


def test_order_by_limit(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a FROM input ORDER BY a DESC LIMIT 3;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [5, 1, 9, 3, 7]}},
    )
    assert out == pa.table({"a": [9, 7, 5]})


def test_duplicate_output_name_last_wins(run_dtl):
    # reference ast_to_ir.py:622-628: position of first occurrence,
    # value of last binding
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a AS x, b, b AS x FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2], "b": [10, 20]}},
    )
    assert out == pa.table({"x": [10, 20], "b": [10, 20]})


def test_scalar_functions(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT upper(s) AS u, length(s) AS n, concat(s, '!') AS e,
                   round_to(d * 1.5, 1) AS r
            FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"s": ["ab", "cde"], "d": [1.0, 2.0]}},
    )
    assert out == pa.table(
        {"u": ["AB", "CDE"], "n": [2, 3], "e": ["ab!", "cde!"], "r": [1.5, 3.0]}
    )


def test_strict_type_error_int_plus_double(run_dtl):
    with pytest.raises(DtlTypeError):
        run1(
            run_dtl,
            """
            WITH input AS IMPORT 'input';
            WITH output AS SELECT a + 1.5 AS x FROM input;
            EXPORT output TO 'output';
            """,
            {"input": {"a": [1, 2]}},
        )


def test_strict_type_error_text_compare_int(run_dtl):
    with pytest.raises(DtlTypeError):
        run1(
            run_dtl,
            """
            WITH input AS IMPORT 'input';
            WITH output AS SELECT * FROM input WHERE s = 1;
            EXPORT output TO 'output';
            """,
            {"input": {"s": ["a"]}},
        )


def test_unknown_column_error(run_dtl):
    with pytest.raises(DtlNameError):
        run1(
            run_dtl,
            """
            WITH input AS IMPORT 'input';
            WITH output AS SELECT nope FROM input;
            EXPORT output TO 'output';
            """,
            {"input": {"a": [1]}},
        )


def test_no_derivable_name_error(run_dtl):
    with pytest.raises(DtlNameError):
        run1(
            run_dtl,
            """
            WITH input AS IMPORT 'input';
            WITH output AS SELECT a + a FROM input;
            EXPORT output TO 'output';
            """,
            {"input": {"a": [1]}},
        )


def test_integer_division_truncates(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a / b AS q FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [7, -7, 9], "b": [2, 2, 3]}},
    )
    assert out == pa.table({"q": [3, -3, 3]})


def test_integer_division_exact_beyond_double_precision(run_dtl):
    # 2^60 + 3 is not representable as a double; a double-division round
    # trip would silently yield the wrong quotient. Spark's IntegralDivide
    # stays in integer arithmetic, matching pyarrow's exact divide
    # (reference eval.py:214-224).
    big = 2**60 + 3
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT a / b AS q FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [big, -big], "b": [3, 3]}},
    )
    assert out == pa.table({"q": [big // 3, -(big // 3)]})


def test_chained_with_bindings(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH doubled AS SELECT a * 2 AS a FROM input;
        WITH output AS SELECT a + 1 AS a FROM doubled;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2, 3]}},
    )
    assert out == pa.table({"a": [3, 5, 7]})


def test_self_join_with_aliases(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH t AS IMPORT 't';
        WITH output AS
            SELECT a.k AS left_k, b.k AS right_k
            FROM t AS a JOIN t AS b ON a.k + 1 = b.k;
        EXPORT output TO 'output';
        """,
        {"t": {"k": [1, 2, 3]}},
    )
    assert out == pa.table({"left_k": [1, 2], "right_k": [2, 3]})


def test_approx_count_distinct(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT k, count_distinct(v) AS exact, approx_count_distinct(v) AS approx
            FROM input GROUP BY k ORDER BY k;
        EXPORT output TO 'output';
        """,
        {"input": {"k": [1] * 50 + [2] * 50, "v": list(range(50)) + [0] * 50}},
    )
    d = out.to_pydict()
    assert d["k"] == [1, 2]
    assert d["exact"] == [50, 1]
    # HLL++ default rsd = 5%: exact at these cardinalities
    assert d["approx"][1] == 1
    assert abs(d["approx"][0] - 50) <= 3


def test_datediff_days(run_dtl):
    import datetime

    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT datediff_days(b, a) AS d FROM input;
        EXPORT output TO 'output';
        """,
        {
            "input": {
                "a": [
                    datetime.datetime(2000, 1, 1, 23, 59),
                    datetime.datetime(2000, 1, 31, 0, 0),
                ],
                "b": [
                    datetime.datetime(2000, 1, 2, 0, 1),
                    datetime.datetime(2000, 1, 1, 12, 0),
                ],
            }
        },
    )
    # whole calendar days after date truncation (SQL DATEDIFF
    # convention): times of day never contribute
    assert out.to_pydict()["d"] == [1, -30]


def test_datediff_days_rejects_mixed_types(run_dtl):
    import datetime

    with pytest.raises(DtlTypeError):
        run1(
            run_dtl,
            """
            WITH input AS IMPORT 'input';
            WITH output AS SELECT datediff_days(a, b) AS d FROM input;
            EXPORT output TO 'output';
            """,
            {
                "input": {
                    "a": [datetime.datetime(2000, 1, 1)],
                    "b": [7],
                }
            },
        )


def test_semi_anti_self_join_chain(run_dtl):
    # q21's control shape in miniature: keys late in finalized orders,
    # kept only when another member exists (SEMI) and no OTHER late
    # member exists (ANTI against a renamed self-copy).
    out = run1(
        run_dtl,
        """
        WITH lines AS IMPORT 'lines';
        WITH late AS
            SELECT DISTINCT ok AS lo, sk AS ls FROM lines WHERE late = 1;
        WITH members AS SELECT DISTINCT ok AS mo, sk AS ms FROM lines;
        WITH late_b AS SELECT lo AS lo2, ls AS ls2 FROM late;
        WITH waiting AS
            SELECT lo, ls FROM late SEMI JOIN members ON lo = mo & ls != ms;
        WITH output AS
            SELECT lo, ls FROM waiting ANTI JOIN late_b ON lo = lo2 & ls != ls2
            ORDER BY lo, ls;
        EXPORT output TO 'output';
        """,
        # order 1: supplier 10 late, 11 on time  -> sole late, kept
        # order 2: suppliers 10 and 11 both late -> neither kept
        # order 3: single-supplier order, late   -> no other member, dropped
        {
            "lines": {
                "ok": [1, 1, 2, 2, 3],
                "sk": [10, 11, 10, 11, 12],
                "late": [1, 0, 1, 1, 1],
            }
        },
    )
    assert out.to_pydict() == {"lo": [1], "ls": [10]}


# --- mutation statements (UPDATE / DELETE / INSERT / BEGIN) ----------------
# The reference reserves these keywords with empty stub AST nodes
# (reference nodes.py:331-354) and registers no productions
# (parser.py:310-317); this repo completes them with copy-on-write
# semantics over script bindings.


def test_update_simultaneous_assignment_swaps(run_dtl):
    # SQL UPDATE semantics: every SET expression reads the OLD row, so
    # SET a = b, b = a swaps.
    out = run1(
        run_dtl,
        """
        WITH t AS IMPORT 't';
        UPDATE t SET a = b, b = a;
        EXPORT t TO 'output';
        """,
        {"t": {"a": [1, 2], "b": [10, 20]}},
    )
    assert out.to_pydict() == {"a": [10, 20], "b": [1, 2]}


def test_update_where_null_predicate_keeps_old_value(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH t AS IMPORT 't';
        UPDATE t SET v = v * 100 WHERE k < 2.0;
        EXPORT t TO 'output';
        """,
        {"t": {"k": [1.0, None, 3.0], "v": [5, 6, 7]}},
    )
    # NULL predicate rows are NOT updated (row 2), like SQL UPDATE
    assert out.to_pydict() == {"k": [1.0, None, 3.0], "v": [500, 6, 7]}


def test_update_strict_typing_and_unknown_column(run_dtl):
    data = {"t": {"a": [1], "s": ["x"]}}
    with pytest.raises(DtlTypeError):
        run1(
            run_dtl,
            "WITH t AS IMPORT 't'; UPDATE t SET a = s; EXPORT t TO 'output';",
            data,
        )
    with pytest.raises(DtlNameError):
        run1(
            run_dtl,
            "WITH t AS IMPORT 't'; UPDATE t SET zz = 1; EXPORT t TO 'output';",
            data,
        )
    with pytest.raises(DtlNameError):
        run1(
            run_dtl,
            "WITH t AS IMPORT 't'; UPDATE t SET a = 1, a = 2; EXPORT t TO 'output';",
            data,
        )


def test_delete_null_predicate_keeps_row(run_dtl):
    # DELETE removes rows only where the predicate is TRUE; NULL keeps
    out = run1(
        run_dtl,
        """
        WITH t AS IMPORT 't';
        DELETE FROM t WHERE k = 1.0;
        EXPORT t TO 'output';
        """,
        {"t": {"k": [1.0, None, 3.0]}},
    )
    assert out.to_pydict() == {"k": [None, 3.0]}


def test_delete_without_where_empties_binding(run_dtl):
    out = run1(
        run_dtl,
        "WITH t AS IMPORT 't'; DELETE FROM t; EXPORT t TO 'output';",
        {"t": {"k": [1, 2, 3]}},
    )
    assert out.to_pydict() == {"k": []}


def test_insert_appends_after_existing_rows(run_dtl):
    out = run1(
        run_dtl,
        """
        WITH t AS IMPORT 't';
        WITH extra AS IMPORT 'extra';
        INSERT INTO t SELECT k + 10 AS k FROM t WHERE k <= 2;
        INSERT INTO t extra;
        EXPORT t TO 'output';
        """,
        {"t": {"k": [1, 2, 3]}, "extra": {"k": [99]}},
    )
    # ordered mode: inserted rows sort after existing, per INSERT
    assert out.to_pydict() == {"k": [1, 2, 3, 11, 12, 99]}


def test_insert_schema_mismatch_raises(run_dtl):
    with pytest.raises(DtlTypeError):
        run1(
            run_dtl,
            """
            WITH t AS IMPORT 't';
            INSERT INTO t SELECT s AS k FROM t;
            EXPORT t TO 'output';
            """,
            {"t": {"k": [1], "s": ["x"]}},
        )


def test_mutations_compose_and_are_copy_on_write(run_dtl):
    # A binding captured (exported) BEFORE a mutation is unaffected by
    # it: mutations rebind the name, they do not mutate the old plan.
    outs = run_dtl(
        """
        WITH t AS IMPORT 't';
        EXPORT t TO 'before';
        UPDATE t SET v = v + 1 WHERE k = 1;
        DELETE FROM t WHERE v = 20;
        EXPORT t TO 'after';
        """,
        {"t": pa.table({"k": [1, 2], "v": [10, 20]})},
    )
    assert outs["before"].to_pydict() == {"k": [1, 2], "v": [10, 20]}
    assert outs["after"].to_pydict() == {"k": [1], "v": [11]}


def test_transaction_rollback_restores_bindings_and_exports(run_dtl):
    outs = run_dtl(
        """
        WITH t AS IMPORT 't';
        BEGIN 'speculative cleanup';
        DELETE FROM t;
        EXPORT t TO 'staged';
        ROLLBACK;
        UPDATE t SET v = v * 2;
        EXPORT t TO 'output';
        """,
        {"t": pa.table({"v": [1, 2]})},
    )
    assert "staged" not in outs  # rolled-back export discarded
    assert outs["output"].to_pydict() == {"v": [2, 4]}


def test_transaction_commit_applies(run_dtl):
    outs = run_dtl(
        """
        WITH t AS IMPORT 't';
        BEGIN;
        UPDATE t SET v = v * 2;
        COMMIT;
        EXPORT t TO 'output';
        """,
        {"t": pa.table({"v": [3]})},
    )
    assert outs["output"].to_pydict() == {"v": [6]}


def test_transaction_misuse_raises(run_dtl):
    from python_dtl_spark.errors import DtlTransactionError

    cases = [
        "WITH t AS IMPORT 't'; COMMIT;",
        "WITH t AS IMPORT 't'; ROLLBACK;",
        "WITH t AS IMPORT 't'; BEGIN; BEGIN;",
        "WITH t AS IMPORT 't'; BEGIN;",  # unterminated
    ]
    for src in cases:
        with pytest.raises(DtlTransactionError):
            run_dtl(src, {"t": pa.table({"v": [1]})})


def test_limit_after_distinct_in_aggregate_path(run_dtl):
    """SELECT DISTINCT ... GROUP BY ... LIMIT n must dedup BEFORE
    limiting (SQL semantics; the plain-select path already did) — the
    old order could return fewer than n distinct rows although n
    exist."""
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT DISTINCT x FROM input GROUP BY x, y LIMIT 3;
        EXPORT output TO 'output';
        """,
        {"input": {"x": [1, 1, 2, 2, 3, 3], "y": [1, 2, 3, 4, 5, 6]}},
    )
    assert sorted(out["x"].to_pylist()) == [1, 2, 3]


def test_ordered_limit_without_order_by_takes_first_rows(run_dtl):
    """In ordered mode LIMIT means the FIRST n rows by the reference
    row order, even after an order-scrambling join shuffle."""
    out = run1(
        run_dtl,
        """
        WITH a AS IMPORT 'a';
        WITH b AS IMPORT 'b';
        WITH j AS SELECT a.k AS k, v FROM a JOIN b ON a.k = b.k;
        WITH output AS SELECT k, v FROM j LIMIT 3;
        EXPORT output TO 'output';
        """,
        {
            "a": {"k": list(range(20))},
            "b": {"k": list(range(20)), "v": [i * 10 for i in range(20)]},
        },
    )
    assert out["k"].to_pylist() == [0, 1, 2]


def test_round_returns_double_for_integer_input(run_dtl):
    """round() declares DOUBLE; Spark's round(int, 0) returns the input
    type, so the engine must cast — otherwise the physical schema
    silently diverges from the declared one."""
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS SELECT round(a) + 0.5 AS r FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"a": [1, 2]}},
    )
    import pyarrow as pa
    assert out["r"].type == pa.float64()
    assert out["r"].to_pylist() == [1.5, 2.5]


def test_cross_join_rejects_using(run_dtl):
    """CROSS JOIN ... USING previously parsed and silently discarded the
    USING, returning the full cross product."""
    import pytest as _pytest

    from python_dtl_spark.errors import DtlSyntaxError
    from python_dtl_spark.lang.parser import parse

    with _pytest.raises(DtlSyntaxError, match="CROSS JOIN takes no USING"):
        parse("WITH o AS SELECT a FROM t CROSS JOIN u USING (k);")


def test_unterminated_block_comment_clear_error():
    import pytest as _pytest

    from python_dtl_spark.errors import DtlSyntaxError
    from python_dtl_spark.lang.lexer import tokenize

    with _pytest.raises(DtlSyntaxError, match="unterminated block comment"):
        tokenize("WITH x AS SELECT a FROM t; /* oops")


def test_same_root_import_export_overlap_rejected(spark, tmp_path):
    """A script importing AND exporting the same location under one
    root is rejected up front: exports run after full compilation, so
    the overwrite would delete files the compiled import plan pins."""
    import pytest as _pytest

    from python_dtl_spark import run_files

    root = str(tmp_path)
    spark.range(5).toDF("a").write.parquet(f"{root}/t.parquet")
    with _pytest.raises(ValueError, match="imports AND exports"):
        run_files(
            "WITH t AS IMPORT 't';\nEXPORT t TO 't';\n",
            spark=spark,
            input_dir=root,
            output_dir=root,
        )


def test_bytes_literals_and_functions(run_dtl):
    """Bytes literals flow through the engine as BinaryType and the
    bytes function family is strict-typed: encode/decode cross the
    TEXT<->BYTES boundary, concat/hex/octet_length work on BYTES, and
    equality against a bytes literal filters real data.  The reference
    declares all of this and evaluates none of it (nodes.py:42-44,
    eval.py:119 crashes on pa.bytes())."""
    out = run1(
        run_dtl,
        """
        WITH input AS IMPORT 'input';
        WITH output AS
            SELECT s,
                   hex(concat(b'\\x00\\xAb', encode(s))) AS sig,
                   octet_length(encode(s)) AS n,
                   decode(encode(s)) AS back,
                   encode(s) = b'hi' AS is_hi
            FROM input;
        EXPORT output TO 'output';
        """,
        {"input": {"s": ["hi", "yo!"]}},
    )
    assert out == pa.table(
        {
            "s": ["hi", "yo!"],
            "sig": ["00AB6869", "00AB796F21"],
            "n": [2, 3],
            "back": ["hi", "yo!"],
            "is_hi": [True, False],
        }
    )


def test_bytes_strict_typing(run_dtl):
    """No implicit TEXT<->BYTES coercion anywhere: mixing the dtypes in
    concat, equality or the unary bytes functions is a DtlTypeError."""
    data = {"input": {"s": ["a"]}}
    for body in [
        "SELECT concat(s, b'x') AS c FROM input;",
        "SELECT (s = b'x') AS c FROM input;",
        "SELECT hex(s) AS c FROM input;",
        "SELECT octet_length(s) AS c FROM input;",
        "SELECT decode(s) AS c FROM input;",
        "SELECT encode(b'x') AS c FROM input;",
        "SELECT (b'x' < b'y') AS c FROM input;",
    ]:
        with pytest.raises(DtlTypeError):
            run1(
                run_dtl,
                "WITH input AS IMPORT 'input';\nWITH output AS "
                + body
                + "\nEXPORT output TO 'output';",
                data,
            )


def test_bytes_literal_parquet_round_trip(spark, tmp_path):
    """A bytes literal survives the full user flow: DTL script →
    BinaryType column → EXPORT to parquet → read back byte-identical
    (the reference's Bytes node could never reach its io layer — eval
    crashed first)."""
    from python_dtl_spark.runtime import run_files

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    spark.createDataFrame([("a",), ("b",)], "k string").write.parquet(
        str(indir / "t.parquet")
    )
    run_files(
        "WITH t AS IMPORT 't';\n"
        "WITH o AS SELECT k, b'\\x00raw\\xff' AS blob FROM t;\n"
        "EXPORT o TO 'o';\n",
        spark=spark,
        input_dir=str(indir),
        output_dir=str(outdir),
    )
    back = spark.read.parquet(str(outdir / "o.parquet"))
    assert dict(back.dtypes)["blob"] == "binary"
    vals = {bytes(r.blob) for r in back.collect()}
    assert vals == {b"\x00raw\xff"}
