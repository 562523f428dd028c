"""Differential tests: JAX device lowering vs host-exact evaluation.

The property being checked is the reference's core exactness contract
(SURVEY §4): for every row, the device path must either (a) produce exactly
the host value, (b) raise exactly the host error, or (c) punt with
CPU_RECHECK — never silently return a wrong answer.
"""

from decimal import Decimal

import numpy as np
import pytest

import pg_strom_tpu  # noqa: F401  (sets x64)
import jax

from pg_strom_tpu.sqltypes import T
from pg_strom_tpu.datastore import column_from_values
from pg_strom_tpu.errors import SqlError, ERR_CPU_RECHECK
from pg_strom_tpu.expr.ir import (
    Const, ColumnRef, BoolExpr, NullTest, CaseExpr, resolve_function,
    bind_columns, explicit_cast,
)
from pg_strom_tpu.expr.eval_cpu import eval_expr_cpu
from pg_strom_tpu.expr.lower_jax import (
    build_project_fn, schema_from_chunk_columns, planes_of_column,
)


def run_both(cols_spec, expr, nrows=None):
    """cols_spec: list of (name, T, values). Returns (cpu_rows, dev_result).

    cpu_rows: list of ('val', v) or ('err', SqlError) per row.
    dev_result: (data, valid, err) numpy arrays (+exp for numeric)."""
    names = [n for n, _, _ in cols_spec]
    cols = [column_from_values(t, vs) for _, t, vs in cols_spec]
    n = len(cols_spec[0][2])
    layout = {name: i for i, name in enumerate(names)}
    bound = bind_columns(expr, layout)

    # host-exact
    cpu = []
    for i in range(n):
        try:
            cpu.append(("val", eval_expr_cpu(bound, lambda s: cols[s].get(i))))
        except SqlError as e:
            cpu.append(("err", e))

    # device
    schema = schema_from_chunk_columns(names, cols)
    fn = build_project_fn([bound], schema)
    planes = tuple(planes_of_column(c) for c in cols)
    outs, mask, err = jax.jit(fn)(planes, np.int32(n))
    out = tuple(np.asarray(p) for p in outs[0])
    return cpu, (out, np.asarray(err))


def check_consistent(cols_spec, expr, approx=False):
    cpu, ((data, valid, *rest), err) = run_both(cols_spec, expr)
    exp = rest[0] if rest else None
    for i, (kind, v) in enumerate(cpu):
        if err[i] == ERR_CPU_RECHECK:
            continue  # device deferred: acceptable by contract
        if kind == "err":
            assert err[i] == v.code or err[i] != 0, \
                f"row {i}: host error {v.message!r} but device err={err[i]}"
            continue
        assert err[i] == 0, f"row {i}: device err {err[i]} but host value {v!r}"
        if v is None:
            assert not valid[i], f"row {i}: host NULL but device valid"
            continue
        assert valid[i], f"row {i}: host {v!r} but device NULL"
        if exp is not None:
            got = Decimal(int(data[i])).scaleb(int(exp[i]))
            assert got == v, f"row {i}: dev {got} != host {v}"
        elif isinstance(v, bool):
            assert bool(data[i]) == v, f"row {i}: dev {data[i]} != host {v}"
        elif isinstance(v, float):
            if approx:
                assert data[i] == pytest.approx(v, rel=1e-12, abs=1e-300)
            else:
                assert float(data[i]) == v or (np.isnan(data[i]) and np.isnan(v)), \
                    f"row {i}: dev {data[i]!r} != host {v!r}"
        else:
            assert int(data[i]) == v, f"row {i}: dev {data[i]} != host {v}"


def col(name, t):
    return ColumnRef(type=t, name=name)


class TestIntArith:
    def test_add_overflow_int2(self):
        spec = [("a", T.INT2, [1, 32767, -32768, None, 100]),
                ("b", T.INT2, [2, 1, -1, 5, None])]
        check_consistent(spec, resolve_function("+", (col("a", T.INT2), col("b", T.INT2))))

    def test_mixed_width_promotion(self):
        spec = [("a", T.INT2, [5, -3, None]),
                ("b", T.INT4, [100000, 2147483647, 7])]
        e = resolve_function("+", (col("a", T.INT2), col("b", T.INT4)))
        assert e.type is T.INT4
        check_consistent(spec, e)

    def test_int8_mul_overflow(self):
        big = 3_037_000_500  # sqrt(2^63) ~ 3.03e9
        spec = [("a", T.INT8, [big, big, 2, None, -(1 << 62)]),
                ("b", T.INT8, [big, 2, 3, 4, 4])]
        check_consistent(spec, resolve_function("*", (col("a", T.INT8), col("b", T.INT8))))

    def test_div_truncation_and_zero(self):
        spec = [("a", T.INT4, [7, -7, 7, -7, 5, None]),
                ("b", T.INT4, [2, 2, -2, -2, 0, 0])]
        check_consistent(spec, resolve_function("/", (col("a", T.INT4), col("b", T.INT4))))

    def test_mod_sign(self):
        spec = [("a", T.INT4, [7, -7, 7, -7, 3]),
                ("b", T.INT4, [3, 3, -3, -3, 0])]
        check_consistent(spec, resolve_function("%", (col("a", T.INT4), col("b", T.INT4))))

    def test_int8_min_div_minus1(self):
        spec = [("a", T.INT8, [-(1 << 63), 10]),
                ("b", T.INT8, [-1, -1])]
        check_consistent(spec, resolve_function("/", (col("a", T.INT8), col("b", T.INT8))))


class TestFloatArith:
    def test_basic(self):
        spec = [("x", T.FLOAT8, [1.5, -2.25, 1e308, None, 0.0]),
                ("y", T.FLOAT8, [2.5, 4.0, 1e308, 1.0, 3.0])]
        for op in "+-*/":
            check_consistent(spec, resolve_function(op, (col("x", T.FLOAT8), col("y", T.FLOAT8))))

    def test_float4_precision(self):
        spec = [("x", T.FLOAT4, [1.5, 3.14159, 1e38, None]),
                ("y", T.FLOAT4, [2.5, 2.71828, 1e38, 2.0])]
        check_consistent(spec, resolve_function("*", (col("x", T.FLOAT4), col("y", T.FLOAT4))))

    def test_div_by_zero(self):
        spec = [("x", T.FLOAT8, [1.0, 0.0]), ("y", T.FLOAT8, [0.0, 0.0])]
        check_consistent(spec, resolve_function("/", (col("x", T.FLOAT8), col("y", T.FLOAT8))))


class TestNumeric:
    def test_add_align(self):
        spec = [("x", T.NUMERIC, [Decimal("1.5"), Decimal("0.001"), None,
                                  Decimal("123456789.123456789")]),
                ("y", T.NUMERIC, [Decimal("2.25"), Decimal("1000"),
                                  Decimal("1"), Decimal("0.000000001")])]
        check_consistent(spec, resolve_function("+", (col("x", T.NUMERIC), col("y", T.NUMERIC))))

    def test_mul(self):
        spec = [("x", T.NUMERIC, [Decimal("1.5"), Decimal("-0.25")]),
                ("y", T.NUMERIC, [Decimal("4"), Decimal("8.8")])]
        check_consistent(spec, resolve_function("*", (col("x", T.NUMERIC), col("y", T.NUMERIC))))

    def test_out_of_window_is_rechecked(self):
        spec = [("x", T.NUMERIC, [Decimal("1e48"), Decimal("1e-32")]),
                ("y", T.NUMERIC, [Decimal("1e48"), Decimal("1e-32")])]
        cpu, ((data, valid, exp), err) = run_both(
            spec, resolve_function("*", (col("x", T.NUMERIC), col("y", T.NUMERIC))))
        assert (err == ERR_CPU_RECHECK).all()  # 1e96 / 1e-64 out of window

    def test_window_boundary_matches_reference(self):
        # 1E+48 and 1E-32 representable; 1E+49 / 1E-33 not (recheck_agg corpus)
        from pg_strom_tpu.sqltypes import numeric_from_decimal
        assert numeric_from_decimal(Decimal("1E+48"))[3] is True
        assert numeric_from_decimal(Decimal("1E-32"))[3] is True
        assert numeric_from_decimal(Decimal("1E+49"))[3] is False
        assert numeric_from_decimal(Decimal("1E-33"))[3] is False

    def test_compare(self):
        spec = [("x", T.NUMERIC, [Decimal("1.5"), Decimal("1.50"), Decimal("-2")]),
                ("y", T.NUMERIC, [Decimal("1.49"), Decimal("1.5"), Decimal("3")])]
        for op in ("=", "<", ">=", "<>"):
            check_consistent(spec, resolve_function(op, (col("x", T.NUMERIC), col("y", T.NUMERIC))))


class TestBoolLogic:
    def test_kleene_and_or(self):
        spec = [("p", T.BOOL, [True, True, False, None, None, False]),
                ("q", T.BOOL, [True, None, None, None, False, False])]
        for op in ("and", "or"):
            e = BoolExpr(type=T.BOOL, op=op,
                         args=(col("p", T.BOOL), col("q", T.BOOL)))
            check_consistent(spec, e)

    def test_null_test(self):
        spec = [("p", T.INT4, [1, None, 3])]
        check_consistent(spec, NullTest(type=T.BOOL, arg=col("p", T.INT4), isnull=True))
        check_consistent(spec, NullTest(type=T.BOOL, arg=col("p", T.INT4), isnull=False))


class TestCase:
    def test_case_masks_errors(self):
        # CASE WHEN b <> 0 THEN a / b ELSE 0  — division never fires on b=0
        spec = [("a", T.INT4, [10, 20, 30]), ("b", T.INT4, [2, 0, 5])]
        cond = resolve_function("<>", (col("b", T.INT4), Const(type=T.INT4, value=0)))
        div = resolve_function("/", (col("a", T.INT4), col("b", T.INT4)))
        e = CaseExpr(type=T.INT4, whens=((cond, div),),
                     orelse=Const(type=T.INT4, value=0))
        check_consistent(spec, e)

    def test_null_args_mask_errors(self):
        # NULL / 0 is NULL, not an error (strictness)
        spec = [("a", T.INT4, [None]), ("b", T.INT4, [0])]
        check_consistent(spec, resolve_function("/", (col("a", T.INT4), col("b", T.INT4))))


class TestCasts:
    def test_int_narrowing(self):
        spec = [("a", T.INT4, [100, 40000, -40000, None])]
        check_consistent(spec, explicit_cast(col("a", T.INT4), T.INT2))

    def test_float_to_int_rounding(self):
        spec = [("x", T.FLOAT8, [1.5, 2.5, -1.5, 0.4, 1e19])]
        check_consistent(spec, explicit_cast(col("x", T.FLOAT8), T.INT8))

    def test_numeric_to_int(self):
        spec = [("x", T.NUMERIC, [Decimal("1.5"), Decimal("2.5"), Decimal("-1.5"),
                                  Decimal("10"), Decimal("0.49")])]
        check_consistent(spec, explicit_cast(col("x", T.NUMERIC), T.INT4))

    def test_int_to_numeric(self):
        spec = [("a", T.INT8, [5, -123, None])]
        check_consistent(spec, explicit_cast(col("a", T.INT8), T.NUMERIC))


class TestText:
    def test_col_vs_const(self):
        spec = [("s", T.TEXT, ["apple", "banana", None, "cherry", "apricot"])]
        for op, val in [("=", "banana"), ("<>", "banana"), ("<", "b"),
                        (">=", "b"), ("=", "missing"), ("<=", "apricot")]:
            e = resolve_function(op, (col("s", T.TEXT), Const(type=T.TEXT, value=val)))
            check_consistent(spec, e)


class TestMath:
    def test_math1(self):
        spec = [("x", T.FLOAT8, [4.0, 0.25, 100.0, None, 2.0])]
        for f in ("sqrt", "exp", "ln", "floor", "ceil", "cbrt", "sin", "round"):
            e = resolve_function(f, (col("x", T.FLOAT8),))
            check_consistent(spec, e, approx=True)

    def test_sqrt_negative(self):
        spec = [("x", T.FLOAT8, [-1.0])]
        cpu, ((data, valid), err) = run_both(
            spec, resolve_function("sqrt", (col("x", T.FLOAT8),)))
        assert cpu[0][0] == "err"
        assert err[0] != 0  # device reports recheck or error


class TestPadding:
    def test_rows_beyond_nrows_never_error(self):
        # padded region contains 0 divisor but nrows masks it out
        spec = [("a", T.INT4, [10, 20]), ("b", T.INT4, [2, 5])]
        names = ["a", "b"]
        cols = [column_from_values(t, vs + [0, 0]) for (_, t, vs) in spec]
        layout = {n: i for i, n in enumerate(names)}
        e = bind_columns(resolve_function("/", (col("a", T.INT4), col("b", T.INT4))), layout)
        schema = schema_from_chunk_columns(names, cols)
        fn = build_project_fn([e], schema)
        planes = tuple(planes_of_column(c) for c in cols)
        outs, mask, err = jax.jit(fn)(planes, np.int32(2))
        assert np.asarray(err).max() == 0
        assert list(np.asarray(mask)) == [True, True, False, False]


class TestTimestampDateCast:
    def test_timestamp_to_date(self):
        # usec since 2000-01-01; includes pre-epoch values (floored day)
        from pg_strom_tpu.expr.ir import explicit_cast
        usec_day = 86_400_000_000
        vals = [0, 1, usec_day - 1, usec_day, 5 * usec_day + 123,
                -1, -usec_day, -usec_day - 1, None]
        spec = [("t", T.TIMESTAMP, vals)]
        check_consistent(spec, explicit_cast(col("t", T.TIMESTAMP), T.DATE))

    def test_date_roundtrip(self):
        from pg_strom_tpu.expr.ir import explicit_cast
        days = [0, 1, -1, 7305, None]
        spec = [("d", T.DATE, days)]
        e = explicit_cast(explicit_cast(col("d", T.DATE), T.TIMESTAMP), T.DATE)
        check_consistent(spec, e)


class TestTimeCatalogGaps:
    """Round-2 catalog additions: timestamp->time cast and date+time
    (reference opencl_timelib.h:261, :382)."""

    def _dev_vs_host(self, expr_sql, cols, want):
        import numpy as np
        import jax
        from pg_strom_tpu.datastore import Database, Table, column_from_values
        from pg_strom_tpu.sql.api import execute
        from pg_strom_tpu.config import override
        db = Database()
        db.create(Table.from_columns("tt", cols))
        with override(debug_force_offload=True):
            dev = execute(f"select {expr_sql} from tt", db).rows
        with override(enabled=False):
            host = execute(f"select {expr_sql} from tt", db).rows
        assert dev == host == want, (dev, host, want)

    def test_timestamp_to_time_cast(self):
        from pg_strom_tpu.datastore import column_from_values
        usec_day = 86_400_000_000
        vals = [3 * usec_day + 7_500_000, -2 * usec_day + 5, 0, None]
        self._dev_vs_host(
            "tt.ts::time",
            {"ts": column_from_values(T.TIMESTAMP, vals)},
            [(7_500_000,), (5,), (0,), (None,)])

    def test_date_plus_time(self):
        from pg_strom_tpu.datastore import column_from_values
        usec_day = 86_400_000_000
        self._dev_vs_host(
            "tt.d + tt.t",
            {"d": column_from_values(T.DATE, [10, -3, None]),
             "t": column_from_values(T.TIME, [5_000_000, 12, 7])},
            [(10 * usec_day + 5_000_000,), (-3 * usec_day + 12,), (None,)])

    def test_time_plus_date(self):
        from pg_strom_tpu.datastore import column_from_values
        usec_day = 86_400_000_000
        self._dev_vs_host(
            "tt.t + tt.d",
            {"d": column_from_values(T.DATE, [4]),
             "t": column_from_values(T.TIME, [99])},
            [(4 * usec_day + 99,)])
