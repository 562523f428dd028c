"""Fused Pallas preagg kernel (ops/preagg_fused.py) vs the XLA MXU path.

Runs the SAME build_preagg_fn program with use_fused_preagg on/off (the
fused kernel executes in Pallas interpret mode on the CPU backend) and
compares the host-absorbed semantics: recovered group keys, collision and
overflow flags, and every extracted partial.  The raw column layouts
legitimately differ (key sumsq is decomposed into a^2/ab/b^2 limb blocks),
so comparisons go through mxu_absorb, exactly like the executor.

Reference parity: the regression corpus this guards is the gpupreagg
aggregate suite (expected/group_agg.out etc.)."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from pg_strom_tpu import T
from pg_strom_tpu.config import override
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
from pg_strom_tpu.expr.lower_jax import ColMeta
from pg_strom_tpu.ops.preagg import (AggInstance, lookup_agg,
                                     build_preagg_fn, extract_partials,
                                     merge_partials)
from pg_strom_tpu.ops.preagg_mxu import mxu_absorb
from pg_strom_tpu.ops.preagg_fused import fused_supported
from pg_strom_tpu.exec.hostexec import canon_group_key

N = 512
G = 64


def _insts(specs):
    out = []
    for aggname, arg in specs:
        args = arg if isinstance(arg, tuple) else (arg,)
        d, fam = lookup_agg(aggname, tuple(a.type for a in args))
        out.append(AggInstance(aggname=aggname, family=fam,
                               slots=d.slots, args=args))
    return out


def _absorb(out, group_exprs, insts, key_metas=None):
    states, displays = {}, {}
    collided, overflow = mxu_absorb(
        out, group_exprs, insts, key_metas or [None] * len(group_exprs),
        states, displays, merge_partials, extract_partials, canon_group_key)
    return collided, overflow, states, displays


def _run_both(schema, group_exprs, insts, pred, cols, salt=0):
    args = (cols, np.int32(N), np.uint64(salt))
    with override(use_fused_preagg=True, force_fused_preagg_cpu=True):
        fn_f = build_preagg_fn(schema, group_exprs, insts, pred, G,
                               strategy="mxu")
        out_f = jax.device_get(fn_f(*args))
    with override(use_fused_preagg=False):
        fn_x = build_preagg_fn(schema, group_exprs, insts, pred, G,
                               strategy="mxu")
        out_x = jax.device_get(fn_x(*args))
    return out_f, out_x


def _assert_semantic_equal(out_f, out_x, group_exprs, insts, key_metas=None):
    cf, of_, sf, df = _absorb(out_f, group_exprs, insts, key_metas)
    cx, ox, sx, dx = _absorb(out_x, group_exprs, insts, key_metas)
    assert (cf, of_) == (cx, ox), f"flags fused={cf},{of_} xla={cx},{ox}"
    if cf or of_:
        return
    assert sorted(map(repr, sf)) == sorted(map(repr, sx))
    for k in sf:
        for pf, px in zip(sf[k], sx[k]):
            assert set(pf) == set(px), (k, set(pf), set(px))
            for kk in pf:
                a, b = pf[kk], px[kk]
                if isinstance(a, float):
                    assert a == pytest.approx(b, rel=1e-12, abs=1e-300), \
                        (k, kk, a, b)
                else:
                    assert a == b, (k, kk, a, b)


def _cols(*pairs):
    return tuple((jax.device_put(np.asarray(d)),
                  jax.device_put(np.asarray(v, np.bool_))) for d, v in pairs)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


def _keys_int4(rng, nkeys=5):
    return (rng.integers(0, nkeys, N) * 11 - 17).astype(np.int32)


def test_flagship_mix():
    rng = np.random.default_rng(1)
    schema = [ColMeta("k", T.INT4), ColMeta("x", T.FLOAT4),
              ColMeta("y", T.INT8)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    pred = resolve_function(">", (x, Const(type=T.FLOAT4, value=0.0)))
    insts = _insts([("sum", x), ("count", x), ("sum", y), ("max", y)])
    cols = _cols(
        (_keys_int4(rng), np.ones(N, np.bool_)),
        ((rng.random(N).astype(np.float32) - 0.4) * 100, rng.random(N) > 0.1),
        (rng.integers(-(1 << 40), 1 << 40, N).astype(np.int64),
         rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, pred, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_int_sum_sumsq_families():
    """stddev/var over int2/int4 exercise sum_i + sumsq_i lanes."""
    rng = np.random.default_rng(2)
    schema = [ColMeta("k", T.INT4), ColMeta("a", T.INT2),
              ColMeta("b", T.INT4)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    a = ColumnRef(type=T.INT2, name="a", index=1)
    b = ColumnRef(type=T.INT4, name="b", index=2)
    insts = _insts([("stddev", a), ("variance", b), ("sum", a), ("avg", b)])
    cols = _cols(
        (_keys_int4(rng, 4), np.ones(N, np.bool_)),
        (rng.integers(-32768, 32767, N).astype(np.int16),
         rng.random(N) > 0.2),
        (rng.integers(-(1 << 31), (1 << 31) - 1, N).astype(np.int32),
         rng.random(N) > 0.2),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_multi_key_types():
    """bool + int2 + date keys: three C-S blocks in one kernel."""
    rng = np.random.default_rng(3)
    schema = [ColMeta("kb", T.BOOL), ColMeta("ks", T.INT2),
              ColMeta("kd", T.DATE), ColMeta("x", T.FLOAT4)]
    kb = ColumnRef(type=T.BOOL, name="kb", index=0)
    ks = ColumnRef(type=T.INT2, name="ks", index=1)
    kd = ColumnRef(type=T.DATE, name="kd", index=2)
    x = ColumnRef(type=T.FLOAT4, name="x", index=3)
    insts = _insts([("sum", x), ("count", x)])
    cols = _cols(
        (rng.integers(0, 2, N).astype(np.bool_), np.ones(N, np.bool_)),
        ((rng.integers(0, 3, N) * 9 - 5).astype(np.int16),
         rng.random(N) > 0.1),
        ((rng.integers(0, 2, N) + 7000).astype(np.int32),
         np.ones(N, np.bool_)),
        (rng.random(N).astype(np.float32), rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [kb, ks, kd], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [kb, ks, kd], insts)


def test_all_null_group_and_extremes():
    rng = np.random.default_rng(4)
    schema = [ColMeta("k", T.INT4), ColMeta("y", T.INT8)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    y = ColumnRef(type=T.INT8, name="y", index=1)
    insts = _insts([("sum", y), ("count", y)])
    yv = rng.integers(-(1 << 55), 1 << 55, N).astype(np.int64)
    yv[:8] = [np.iinfo(np.int64).max // 2, np.iinfo(np.int64).min // 2,
              0, -1, 1, 255, -256, 1 << 40]
    keys = _keys_int4(rng, 3)
    valid = rng.random(N) > 0.3
    valid[keys == keys.min()] = False          # one group entirely NULL
    cols = _cols((keys, np.ones(N, np.bool_)), (yv, valid))
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_sum_i_overflow_flags_match():
    """values whose |v| mass exceeds 2^61 must raise overflow both ways."""
    rng = np.random.default_rng(5)
    schema = [ColMeta("k", T.INT4), ColMeta("y", T.INT8)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    y = ColumnRef(type=T.INT8, name="y", index=1)
    insts = _insts([("sum", y)])
    yv = np.full(N, (1 << 61) // 16, np.int64)
    cols = _cols((np.zeros(N, np.int32), np.ones(N, np.bool_)),
                 (yv, np.ones(N, np.bool_)))
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    cf, of_, _, _ = _absorb(out_f, [k], insts)
    cx, ox, _, _ = _absorb(out_x, [k], insts)
    assert of_ and ox


def test_collision_flag_matches():
    """more distinct keys than buckets: both paths must flag collision."""
    rng = np.random.default_rng(6)
    schema = [ColMeta("k", T.INT4), ColMeta("x", T.FLOAT4)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    insts = _insts([("sum", x)])
    cols = _cols((np.arange(N, dtype=np.int32), np.ones(N, np.bool_)),
                 (rng.random(N).astype(np.float32), np.ones(N, np.bool_)))
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    cf, *_ = _absorb(out_f, [k], insts)
    cx, *_ = _absorb(out_x, [k], insts)
    assert cf and cx


def test_fused_supported_gating():
    x4 = ColumnRef(type=T.FLOAT4, name="x", index=0)
    x8 = ColumnRef(type=T.FLOAT8, name="y", index=1)
    ok = _insts([("sum", x4), ("count", x4)])
    assert fused_supported([T.INT4], ok, [(T.FLOAT4,), (T.FLOAT4,)])
    # f64 double-float kinds fuse as head/tail signed-digit lane pairs
    f8 = _insts([("sum", x8), ("stddev", x8)])
    assert fused_supported([T.INT4], f8, [(T.FLOAT8,), (T.FLOAT8,)])
    assert not fused_supported([], ok, [(T.FLOAT4,), (T.FLOAT4,)])


@pytest.fixture()
def _f64_blocks(monkeypatch):
    """f64 double-float blocks are TPU-only in production; force them on
    the CPU backend so the fused head/tail lanes are exercised here."""
    from pg_strom_tpu.ops import preagg_mxu
    monkeypatch.setattr(preagg_mxu, "F64_BLOCKS_ON_CPU", True)
    yield


def test_f64_families_fused(_f64_blocks):
    """float8 sum + stddev + corr: head/tail signed-digit pairs == XLA."""
    rng = np.random.default_rng(41)
    schema = [ColMeta("k", T.INT4), ColMeta("x", T.FLOAT8),
              ColMeta("y", T.FLOAT8)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    x = ColumnRef(type=T.FLOAT8, name="x", index=1)
    y = ColumnRef(type=T.FLOAT8, name="y", index=2)
    insts = _insts([("sum", x), ("stddev", x)])
    cols = _cols(
        (_keys_int4(rng, 4), np.ones(N, np.bool_)),
        ((rng.random(N) - 0.5) * 1e9, rng.random(N) > 0.1),
        ((rng.random(N) - 0.5) * 1e3, rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_f64_corr_fused(_f64_blocks):
    """corr(x, y): five f64 blocks — widest fusable plan (114 columns)."""
    rng = np.random.default_rng(42)
    schema = [ColMeta("k", T.INT4), ColMeta("x", T.FLOAT8),
              ColMeta("y", T.FLOAT8)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    x = ColumnRef(type=T.FLOAT8, name="x", index=1)
    y = ColumnRef(type=T.FLOAT8, name="y", index=2)
    insts = _insts([("corr", (x, y))])
    cols = _cols(
        (_keys_int4(rng, 4), np.ones(N, np.bool_)),
        ((rng.random(N) - 0.5) * 100, rng.random(N) > 0.1),
        ((rng.random(N) - 0.5) * 100, rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_f4_stddev_fused(_f64_blocks):
    """stddev(float4): sumsq_f f64 block alongside the f4 signed block."""
    rng = np.random.default_rng(43)
    schema = [ColMeta("k", T.INT4), ColMeta("x", T.FLOAT4)]
    k = ColumnRef(type=T.INT4, name="k", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    insts = _insts([("stddev", x), ("sum", x)])
    cols = _cols(
        (_keys_int4(rng, 4), np.ones(N, np.bool_)),
        ((rng.random(N).astype(np.float32) - 0.5) * 1e4,
         rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_wide_int8_key():
    """64-bit group key: fused two-word limb blocks == XLA encode."""
    rng = np.random.default_rng(31)
    schema = [ColMeta("k", T.INT8), ColMeta("x", T.FLOAT4)]
    k = ColumnRef(type=T.INT8, name="k", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    base = np.asarray([0, -1, (1 << 62), -(1 << 62), 123456789012345678,
                       (1 << 33) + 7], dtype=np.int64)
    insts = _insts([("sum", x), ("count", x)])
    cols = _cols(
        (base[rng.integers(0, len(base), N)], rng.random(N) > 0.05),
        ((rng.random(N).astype(np.float32) - 0.4) * 10, rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)


def test_wide_timestamp_key():
    rng = np.random.default_rng(32)
    schema = [ColMeta("k", T.TIMESTAMP), ColMeta("y", T.INT8)]
    k = ColumnRef(type=T.TIMESTAMP, name="k", index=0)
    y = ColumnRef(type=T.INT8, name="y", index=1)
    base = (np.asarray([150, 700, 820, 123], dtype=np.int64)
            * 86400_000_000 * 30)
    insts = _insts([("sum", y), ("count", y)])
    cols = _cols(
        (base[rng.integers(0, len(base), N)], np.ones(N, np.bool_)),
        (rng.integers(-(1 << 40), 1 << 40, N).astype(np.int64),
         rng.random(N) > 0.1),
    )
    out_f, out_x = _run_both(schema, [k], insts, None, cols)
    _assert_semantic_equal(out_f, out_x, [k], insts)
