"""v2 raw-plane fused kernel (ops/preagg_fused2.py) vs host-exact results.

Runs the real executor with force_fused_preagg_cpu so the Pallas kernel
executes in interpret mode on the CPU backend; every result is compared
against the pure host tier (offload=False), which is golden-parity-proven
against PostgreSQL."""

from __future__ import annotations

import numpy as np
import pytest

from pg_strom_tpu import T
from pg_strom_tpu.config import override
from pg_strom_tpu.datastore import Table, column_from_values, column_from_numpy
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function, BoolExpr, NullTest
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg
from pg_strom_tpu.exec.preagg_exec import PreAggExecutor


def _mk_table(n=3000, seed=0, with_nulls=True):
    rng = np.random.default_rng(seed)
    kv = rng.integers(5, 21, n).astype(np.int32)           # dense key 5..20
    x = (rng.random(n).astype(np.float32) - 0.3) * 10.0
    y = rng.integers(-(1 << 40), 1 << 40, n).astype(np.int64)
    z = rng.integers(-5000, 5000, n).astype(np.int32)
    if with_nulls:
        kvalid = rng.random(n) > 0.1
        xvalid = rng.random(n) > 0.15
        yvalid = rng.random(n) > 0.2
        zvalid = rng.random(n) > 0.05
    else:
        kvalid = xvalid = yvalid = zvalid = np.ones(n, np.bool_)
    return Table.from_columns("t", {
        "k": column_from_numpy(T.INT4, kv, kvalid),
        "x": column_from_numpy(T.FLOAT4, x, xvalid),
        "y": column_from_numpy(T.INT8, y, yvalid),
        "z": column_from_numpy(T.INT4, z, zvalid),
    })


def _agg(name, col):
    d, fam = lookup_agg(name, (col.type,) if col is not None else ())
    return AggInstance(aggname=name, family=fam, slots=d.slots,
                       args=(col,) if col is not None else ())


def _cols(t):
    names = t.column_names
    return {nm: ColumnRef(type=t.columns[nm].type, name=nm,
                          index=names.index(nm)) for nm in names}


def _run(t, pred, groups, aggs, expect_v2=True):
    with override(force_fused_preagg_cpu=True, use_fused_preagg2=True,
                  chunk_rows=1 << 11):
        ex = PreAggExecutor(t, pred, groups, aggs)
        got = ex.run()
        engaged = ex._v2 is not None
    host = PreAggExecutor(t, pred, groups, aggs, offload=False).run()
    if expect_v2:
        assert engaged, "v2 plan did not engage"
    key = lambda r: tuple((v is None, v) for v in r[:len(groups)])  # noqa
    got_s, host_s = sorted(got, key=key), sorted(host, key=key)
    assert len(got_s) == len(host_s)
    for rg, rh in zip(got_s, host_s):
        assert len(rg) == len(rh)
        for vg, vh in zip(rg, rh):
            if isinstance(vh, float) and isinstance(vg, float):
                # float aggregates: engine contract is PG text equality at
                # extra_float_digits=-3 (stepwise-f32 host accumulation vs
                # the device's once-rounded exact sum differ in last ulps)
                if vh != vg:
                    assert vg == pytest.approx(vh, rel=1e-5, abs=1e-30,
                                               nan_ok=True), (vg, vh)
            else:
                assert vg == vh, (vg, vh)
    return engaged


def test_v2_flagship_shape():
    t = _mk_table()
    c = _cols(t)
    pred = resolve_function(">", (c["x"], Const(type=T.FLOAT4, value=0.25)))
    _run(t, pred, [c["k"]],
         [_agg("sum", c["x"]), _agg("count", c["x"]), _agg("sum", c["y"])])


def test_v2_no_pred_all_kinds():
    t = _mk_table(seed=1)
    c = _cols(t)
    _run(t, None, [c["k"]],
         [_agg("sum", c["z"]), _agg("stddev", c["z"]), _agg("avg", c["z"]),
          _agg("count", c["y"]), _agg("count", None), _agg("sum", c["x"])])


def test_v2_negative_and_wide_int8():
    vals = [-(1 << 62), (1 << 62) - 7, 0, None, 12345, -987654321]
    keys = [1, 1, 2, 2, 3, 3]
    t = Table.from_columns("w", {
        "k": column_from_values(T.INT4, keys),
        "y": column_from_values(T.INT8, vals),
    })
    c = _cols(t)
    _run(t, None, [c["k"]], [_agg("sum", c["y"]), _agg("count", c["y"])])


def test_v2_int8_narrow_range_single_limb():
    """Range < 256 -> one limb; min-bias recovery exact."""
    rng = np.random.default_rng(3)
    n = 2000
    t = Table.from_columns("nr", {
        "k": column_from_numpy(T.INT4, rng.integers(0, 4, n).astype(np.int32)),
        "y": column_from_numpy(T.INT8, (rng.integers(0, 200, n)
                                        + 10**15).astype(np.int64)),
    })
    c = _cols(t)
    _run(t, None, [c["k"]], [_agg("sum", c["y"])])


def test_v2_pred_3vl_and_nulltest():
    t = _mk_table(seed=2)
    c = _cols(t)
    lt = resolve_function("<", (c["z"], Const(type=T.INT4, value=1000)))
    nn = NullTest(type=T.BOOL, arg=c["y"], isnull=False)
    pred = BoolExpr(type=T.BOOL, op="and", args=(lt, nn))
    _run(t, pred, [c["k"]], [_agg("sum", c["z"]), _agg("count", None)])


def test_v2_float_nan_replays_exactly():
    """NaN in a float4 sum rides the fabs shadow to a host replay — result
    must still match the host tier bit-for-bit."""
    t = Table.from_columns("nan", {
        "k": column_from_values(T.INT4, [1, 1, 2, 2]),
        "x": column_from_values(T.FLOAT4, [1.5, float("nan"), 2.5, 3.0]),
    })
    c = _cols(t)
    _run(t, None, [c["k"]], [_agg("sum", c["x"])])


def test_v2_ineligible_falls_back_correctly():
    """INT2 arg / computed arg / two keys: v2 declines, v1 path still
    exact."""
    t = _mk_table(seed=4)
    c = _cols(t)
    plus = resolve_function("+", (c["z"], Const(type=T.INT4, value=1)))
    engaged = _run(t, None, [c["k"]], [_agg("sum", plus)], expect_v2=False)
    assert not engaged
    engaged = _run(t, None, [c["k"], c["z"]], [_agg("count", None)],
                   expect_v2=False)
    assert not engaged


def test_v2_sparse_key_declines():
    t = Table.from_columns("sp", {
        "k": column_from_values(T.INT4, [0, 10**9, 5]),
        "y": column_from_values(T.INT8, [1, 2, 3]),
    })
    c = _cols(t)
    engaged = _run(t, None, [c["k"]], [_agg("sum", c["y"])], expect_v2=False)
    assert not engaged


def test_v2_all_null_key_column():
    t = Table.from_columns("an", {
        "k": column_from_values(T.INT4, [None, None, None]),
        "y": column_from_values(T.INT8, [7, 8, None]),
    })
    c = _cols(t)
    _run(t, None, [c["k"]], [_agg("sum", c["y"]), _agg("count", c["y"])])


def _derive(t, pred, groups, aggs, max_g=4096):
    from pg_strom_tpu.ops.preagg_fused2 import derive_v2_plan
    cols = [t.columns[nm] for nm in t.column_names]
    from pg_strom_tpu.expr.lower_jax import schema_from_chunk_columns
    schema = schema_from_chunk_columns(t.column_names, cols)
    return derive_v2_plan(cols, schema, groups, aggs, pred, max_g)


def test_v2_stats_elision_nullfree():
    """NULL-free arg columns: count/okcnt ride recipe col 0, no cnt column
    or validity plane ships; shadow elided for small-mass floats — and the
    results stay host-exact."""
    t = _mk_table(with_nulls=False)
    c = _cols(t)
    aggs = [_agg("sum", c["x"]), _agg("count", c["x"]), _agg("sum", c["y"])]
    plan = _derive(t, None, [c["k"]], aggs)
    tags = [op[0] for op in plan.sig.ops]
    assert "cnt" not in tags and "fabs" not in tags
    assert not plan.sig.shadow_map
    assert all((w != "valid") for _, w in plan.sig.inputs)
    assert plan.recipes[1]["count"].limbs == [0]       # == mask count
    assert plan.recipes[2]["sum_i"].okcnt == 0
    _run(t, None, [c["k"]], aggs)


def test_v2_cnt_column_shared_across_instances():
    """sum(x) + count(x) + avg(x): ONE cnt column for x, not three."""
    t = _mk_table()
    c = _cols(t)
    plan = _derive(t, None, [c["k"]],
                   [_agg("sum", c["x"]), _agg("count", c["x"]),
                    _agg("avg", c["x"])])
    assert [op[0] for op in plan.sig.ops].count("cnt") == 1
    _run(t, None, [c["k"]],
         [_agg("sum", c["x"]), _agg("count", c["x"]), _agg("avg", c["x"])])


def test_v2_f4_window_shrink_exact():
    """Floats spanning [0.5, 8): stats prove a 4-limb window captures every
    mantissa bit, and the digit sum is the EXACT sum."""
    rng = np.random.default_rng(7)
    n = 4000
    x = (rng.random(n).astype(np.float32) * 7.5 + 0.5).astype(np.float32)
    t = Table.from_columns("w", {
        "k": column_from_numpy(T.INT4, rng.integers(0, 8, n).astype(np.int32)),
        "x": column_from_numpy(T.FLOAT4, x),
    })
    c = _cols(t)
    plan = _derive(t, None, [c["k"]], [_agg("sum", c["x"])])
    f4 = [op for op in plan.sig.ops if op[0] == "f4s"]
    assert f4 and f4[0][4] <= 4, f4          # E=3, Emin=-1 -> ceil(28/8)=4
    assert not plan.sig.shadow_map
    _run(t, None, [c["k"]], [_agg("sum", c["x"])])


def test_v2_f4_all_zero_column():
    t = Table.from_columns("z0", {
        "k": column_from_values(T.INT4, [1, 1, 2]),
        "x": column_from_values(T.FLOAT4, [0.0, -0.0, 0.0]),
    })
    c = _cols(t)
    plan = _derive(t, None, [c["k"]], [_agg("sum", c["x"])])
    f4 = [op for op in plan.sig.ops if op[0] == "f4s"]
    assert f4 and f4[0][4] == 1
    _run(t, None, [c["k"]], [_agg("sum", c["x"])])


def test_v2_f4_inf_declines():
    """+-Inf in the column: max-anchored window is meaningless -> v2
    declines, v1/host path stays exact."""
    t = Table.from_columns("inf", {
        "k": column_from_values(T.INT4, [1, 1, 2, 2]),
        "x": column_from_values(T.FLOAT4, [1.0, float("inf"), 2.0, 3.0]),
    })
    c = _cols(t)
    assert _derive(t, None, [c["k"]], [_agg("sum", c["x"])]) is None
    _run(t, None, [c["k"]], [_agg("sum", c["x"])], expect_v2=False)


def test_v2_f4_nan_keeps_shadow():
    t = Table.from_columns("nans", {
        "k": column_from_values(T.INT4, [1, 2]),
        "x": column_from_values(T.FLOAT4, [1.0, float("nan")]),
    })
    c = _cols(t)
    plan = _derive(t, None, [c["k"]], [_agg("sum", c["x"])])
    assert plan.sig.shadow_map, "NaN column must keep the |v| shadow"


def test_v2_f4_denormal_window_clamps():
    """Denormals push the needed window past 9 limbs: clamp to F4_LIMBS
    (the pre-stats contract: truncation below 2^(E-72), PG-text invisible)."""
    from pg_strom_tpu.ops.preagg_mxu import F4_LIMBS
    t = Table.from_columns("dn", {
        "k": column_from_values(T.INT4, [1, 1]),
        "x": column_from_values(T.FLOAT4, [1.0e30, 1.0e-40]),
    })
    c = _cols(t)
    plan = _derive(t, None, [c["k"]], [_agg("sum", c["x"])])
    f4 = [op for op in plan.sig.ops if op[0] == "f4s"]
    cap = 11 if plan.sig.i8 else F4_LIMBS    # 7-bit digits need more limbs
    assert f4 and f4[0][4] == cap
    _run(t, None, [c["k"]], [_agg("sum", c["x"])])


def test_v2_int8_mode_off_matches():
    """pg_strom.preagg_int8=off: the bf16 pipeline answers identically
    (engages the 8-bit digit widths and the f32 accumulator)."""
    t = _mk_table(seed=8)
    c = _cols(t)
    aggs = [_agg("sum", c["x"]), _agg("count", c["x"]), _agg("sum", c["y"])]
    plan_on = _derive(t, None, [c["k"]], aggs)
    with override(use_preagg_int8=False):
        plan_off = _derive(t, None, [c["k"]], aggs)
        _run(t, None, [c["k"]], aggs)
    assert plan_on.sig.i8 and not plan_off.sig.i8
    assert not plan_off.sig.biased_cols


def test_v2_text_dict_key():
    t = Table.from_columns("tx", {
        "s": column_from_values(T.TEXT, ["b", "a", "b", None, "c"] * 40),
        "z": column_from_values(T.INT4, list(range(200))),
    })
    c = _cols(t)
    _run(t, None, [c["s"]], [_agg("sum", c["z"]), _agg("min", c["z"])],
         expect_v2=False)   # min slot is non-MXU -> v2 declines, still exact
    _run(t, None, [c["s"]], [_agg("sum", c["z"])])
