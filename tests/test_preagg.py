"""Aggregation regression suite: device path vs host-exact path.

The port of the reference's {nogrp,where,group,zero}_agg corpus (SURVEY §4):
every aggregate x every numeric type, with no grouping / WHERE filter /
GROUP BY / zero rows.  The host path (config.enabled=False) plays the role
vanilla PostgreSQL plays for make_expected.sh; the device path must produce
text-identical rows under PG formatting rules with extra_float_digits=-3.
"""

import pytest

import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import T, override
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function, bind_columns
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg
from pg_strom_tpu.exec.preagg_exec import PreAggExecutor
from pg_strom_tpu.models.fixtures import (
    make_preagg_test, make_preagg_zero, make_preagg_overflow,
)
from pg_strom_tpu.utils.pgformat import row_out
from pg_strom_tpu.expr.ir import explicit_cast

AGG_NAMES = ["avg", "count", "max", "min", "sum", "stddev", "stddev_pop",
             "stddev_samp", "variance", "var_pop", "var_samp"]
PAIR_AGGS = ["corr", "covar_pop", "covar_samp"]
TYPE_COLS = [("smlint_x", T.INT2), ("integer_x", T.INT4), ("bigint_x", T.INT8),
             ("real_x", T.FLOAT4), ("float_x", T.FLOAT8), ("nume_x", T.NUMERIC)]


@pytest.fixture(scope="module")
def tbl():
    return make_preagg_test(nrows=2000)


@pytest.fixture(scope="module")
def tbl_zero():
    return make_preagg_zero()


@pytest.fixture(scope="module")
def tbl_overflow():
    return make_preagg_overflow(nrows=800)


def make_agg(table, aggname, colname, coltype):
    layout = {n: i for i, n in enumerate(table.column_names)}
    if aggname in PAIR_AGGS:
        arg = bind_columns(explicit_cast(
            ColumnRef(type=coltype, name=colname), T.FLOAT8), layout)
        d, fam = lookup_agg(aggname, (T.FLOAT8, T.FLOAT8))
        return AggInstance(aggname=aggname, family=fam, slots=d.slots,
                           args=(arg, arg)), d.rettype
    arg = bind_columns(ColumnRef(type=coltype, name=colname), layout)
    d, fam = lookup_agg(aggname, (coltype,))
    return AggInstance(aggname=aggname, family=fam, slots=d.slots,
                       args=(arg,)), d.rettype


def run_query(table, aggname, colname, coltype, pred=None, group=False,
              device=True):
    from pg_strom_tpu.errors import SqlError
    layout = {n: i for i, n in enumerate(table.column_names)}
    inst, ret = make_agg(table, aggname, colname, coltype)
    gexprs = []
    ktypes = []
    if group:
        gexprs = [bind_columns(ColumnRef(type=T.INT4, name="key"), layout)]
        ktypes = [T.INT4]
    p = bind_columns(pred, layout) if pred is not None else None
    try:
        with override(enabled=device, chunk_rows=512, max_groups_device=64):
            rows = PreAggExecutor(table, p, gexprs, [inst]).run()
    except SqlError as e:
        # both paths must raise the same PostgreSQL error (overflow corpus)
        return [f"ERROR: {e.message}"]
    # deterministic order: sort by key (None last)
    rows.sort(key=lambda r: (tuple((v is None, v) for v in r[:len(gexprs)])))
    types = tuple(ktypes) + (ret,)
    return [row_out(r, types, extra_float_digits=-3) for r in rows]


def _rows_equivalent(got: list[str], want: list[str]) -> bool:
    """Formatted-row compare; float fields tolerate last-digit drift.

    Parallel float aggregation is order-independent while PostgreSQL's is
    stepwise; under catastrophic cancellation the 12-digit rendering can
    flip its final digit even though |device - host| is ~1e-12 (the device
    fixed-point sum is the MORE accurate one).  pg_regress absorbs this via
    extra_float_digits; a string compare at a rounding boundary cannot."""
    import math
    if got == want:
        return True
    if len(got) != len(want):
        return False
    for g, w in zip(got, want):
        if g == w:
            continue
        gf, wf = g.split("|"), w.split("|")
        if len(gf) != len(wf):
            return False
        for a, b in zip(gf, wf):
            if a == b:
                continue
            try:
                if not math.isclose(float(a), float(b),
                                    rel_tol=1e-9, abs_tol=1e-9):
                    return False
            except ValueError:
                return False
    return True


def assert_match(table, aggname, colname, coltype, pred=None, group=False):
    got = run_query(table, aggname, colname, coltype, pred, group, device=True)
    want = run_query(table, aggname, colname, coltype, pred, group, device=False)
    assert _rows_equivalent(got, want), (
        f"{aggname}({colname}) group={group}:\n"
        f"device: {got[:5]}\nhost  : {want[:5]}")


@pytest.mark.parametrize("colname,coltype", TYPE_COLS,
                         ids=[c for c, _ in TYPE_COLS])
@pytest.mark.parametrize("aggname", AGG_NAMES + PAIR_AGGS)
class TestNogrpAgg:
    def test_nogrp(self, aggname, colname, coltype, tbl):
        assert_match(tbl, aggname, colname, coltype)


@pytest.mark.parametrize("colname,coltype", TYPE_COLS,
                         ids=[c for c, _ in TYPE_COLS])
@pytest.mark.parametrize("aggname", AGG_NAMES)
class TestGroupAgg:
    def test_group(self, aggname, colname, coltype, tbl):
        assert_match(tbl, aggname, colname, coltype, group=True)


@pytest.mark.parametrize("colname,coltype", TYPE_COLS[:3] + TYPE_COLS[5:],
                         ids=[c for c, _ in TYPE_COLS[:3] + TYPE_COLS[5:]])
@pytest.mark.parametrize("aggname", ["avg", "sum", "stddev", "max", "min"])
class TestWhereAgg:
    def test_where(self, aggname, colname, coltype, tbl):
        pred = resolve_function(
            "=", (ColumnRef(type=T.INT4, name="key"), Const(type=T.INT4, value=1)))
        assert_match(tbl, aggname, colname, coltype, pred=pred, group=True)


@pytest.mark.parametrize("colname,coltype", TYPE_COLS,
                         ids=[c for c, _ in TYPE_COLS])
@pytest.mark.parametrize("aggname", AGG_NAMES + PAIR_AGGS)
class TestZeroAgg:
    def test_zero(self, aggname, colname, coltype, tbl_zero):
        got = run_query(tbl_zero, aggname, colname, coltype, device=True)
        want = run_query(tbl_zero, aggname, colname, coltype, device=False)
        assert got == want
        assert len(got) == 1  # one all-NULL row for ungrouped agg

    def test_zero_grouped_empty(self, aggname, colname, coltype, tbl_zero):
        got = run_query(tbl_zero, aggname, colname, coltype, group=True,
                        device=True)
        assert got == []


@pytest.mark.parametrize("colname,coltype",
                         [("bigint_x", T.INT8), ("nume_x", T.NUMERIC),
                          ("float_x", T.FLOAT8), ("real_x", T.FLOAT4)])
@pytest.mark.parametrize("aggname", ["sum", "avg", "max", "min", "count"])
class TestOverflowAgg:
    """Extreme magnitudes: int64-max sums, 1e308 float8 (beyond the TPU
    emulated-f64 window), 21-digit numerics — must still match host exactly
    via the CpuReCheck tier."""

    def test_overflow_group(self, aggname, colname, coltype, tbl_overflow):
        assert_match(tbl_overflow, aggname, colname, coltype, group=True)


class TestGroupKeyEdgeCases:
    def test_null_key_groups_together(self, tbl):
        got = run_query(tbl, "count", "id", T.INT4, group=True, device=True)
        want = run_query(tbl, "count", "id", T.INT4, group=True, device=False)
        assert got == want
        # 30 int keys + the NULL-key group
        assert len(got) == 31

    def test_many_groups_overflow_device_slots(self, tbl):
        # group by id: 2000 groups > max_groups_device=64 -> recheck tier
        layout = {n: i for i, n in enumerate(tbl.column_names)}
        inst, ret = make_agg(tbl, "sum", "integer_x", T.INT4)
        g = bind_columns(ColumnRef(type=T.INT4, name="id"), layout)
        with override(enabled=True, chunk_rows=512, max_groups_device=64):
            rows_dev = PreAggExecutor(tbl, None, [g], [inst]).run()
        with override(enabled=False):
            rows_host = PreAggExecutor(tbl, None, [g], [inst]).run()
        assert sorted(map(repr, rows_dev)) == sorted(map(repr, rows_host))
