"""Validate + time the fused Pallas preagg vs the XLA MXU formulation.

Runs the flagship chunk shape (group by int4; sum(f4), count, sum(i64),
max(i64) scatter side-path) both ways and diffs the full output contract.
Fresh-process probe; fetch once before timing (BASELINE env truths).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax

from pg_strom_tpu import T
from pg_strom_tpu import config as _cfgmod
from pg_strom_tpu.config import config, override
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
from pg_strom_tpu.expr.lower_jax import ColMeta
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, build_preagg_fn


def build(G, with_max=True):
    schema = [ColMeta("key", T.INT4), ColMeta("x", T.FLOAT4),
              ColMeta("y", T.INT8)]
    key = ColumnRef(type=T.INT4, name="key", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    pred = resolve_function(">", (x, Const(type=T.FLOAT4, value=0.25)))
    specs = [("sum", x), ("count", x), ("sum", y)]
    if with_max:
        specs.append(("max", y))
    insts = []
    for aggname, arg in specs:
        d, fam = lookup_agg(aggname, (arg.type,))
        insts.append(AggInstance(aggname=aggname, family=fam,
                                 slots=d.slots, args=(arg,)))
    return build_preagg_fn(schema, [key], insts, pred, G, strategy="mxu")


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    err = int(jax.device_get(out["err"]))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s err={err}",
          file=sys.stderr)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms", file=sys.stderr)
    return jax.device_get(out), best


def absorb(out, G):
    """Host-semantic view of a chunk output: {group key: partial dicts}."""
    from pg_strom_tpu.ops.preagg_mxu import mxu_absorb
    from pg_strom_tpu.ops.preagg import (AggInstance, lookup_agg,
                                         extract_partials, merge_partials)
    from pg_strom_tpu.exec.hostexec import canon_group_key
    from pg_strom_tpu.expr.ir import ColumnRef
    key = ColumnRef(type=T.INT4, name="key", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    insts = []
    for aggname, arg in (("sum", x), ("count", x), ("sum", y), ("max", y)):
        d, fam = lookup_agg(aggname, (arg.type,))
        insts.append(AggInstance(aggname=aggname, family=fam,
                                 slots=d.slots, args=(arg,)))
    states, displays = {}, {}
    collided, overflow = mxu_absorb(out, [key], insts, [None], states,
                                    displays, merge_partials,
                                    extract_partials, canon_group_key)
    return collided, overflow, states


def main():
    N = 1 << 24 if len(sys.argv) < 2 else int(sys.argv[1])
    G = 256 if len(sys.argv) < 3 else int(sys.argv[2])
    rng = np.random.default_rng(0)
    # signed x values, negative-heavy keys (bias edge), wide i64 range
    xs = (rng.random(N).astype(np.float32) - 0.3) * np.float32(1e3)
    cols = (
        (jax.device_put((rng.integers(0, 8, N) * 7 - 12).astype(np.int32)),
         jax.device_put(np.ones(N, dtype=np.bool_))),
        (jax.device_put(xs),
         jax.device_put((rng.random(N) > 0.05))),
        (jax.device_put(rng.integers(-(1 << 40), 1 << 40, N)
                        .astype(np.int64)),
         jax.device_put((rng.random(N) > 0.05))),
    )
    args = (cols, np.int32(N), np.uint64(0))
    # pred is x > 0.25 so ~57% of signed xs pass; 8 distinct keys at G=256
    # keeps the C-S constancy check collision-free for most salts

    # correctness (with max's scatter side-path): semantic comparison via
    # the host absorb machinery — limb decompositions legitimately differ
    # per column (key sumsq uses a^2/ab/b^2 blocks) while every extracted
    # partial must agree
    with override(use_fused_preagg=True):
        out_f = jax.device_get(jax.jit(build(G))(*args))
    with override(use_fused_preagg=False):
        out_x = jax.device_get(jax.jit(build(G))(*args))
    for salt in (0, 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F):
        a2 = (cols, np.int32(N), np.uint64(salt))
        with override(use_fused_preagg=False):
            out_x = jax.device_get(jax.jit(build(G))(*a2))
        cx, ox, sx = absorb(out_x, G)
        if not cx:
            with override(use_fused_preagg=True):
                out_f = jax.device_get(jax.jit(build(G))(*a2))
            break
    cf, of_, sf = absorb(out_f, G)
    same_keys = sorted(sf) == sorted(sx)
    diffs = []
    for k in sorted(sf):
        for pf, px in zip(sf[k], sx.get(k, [])):
            for kk in pf:
                a, b = pf[kk], px.get(kk)
                eq = (a == b) if not isinstance(a, float) else (
                    b is not None and abs(a - b) <= 1e-9 * max(1, abs(a)))
                if not eq:
                    diffs.append((k, kk, a, b))
    print(f"collide/overflow fused={cf},{of_} xla={cx},{ox}; "
          f"groups fused={len(sf)} xla={len(sx)} same_keys={same_keys}")
    for d in diffs[:6]:
        print("DIFF", d)
    print("semantic_equal=" + str(same_keys and not diffs
                                  and (cf, of_) == (cx, ox)))

    # timing without the scatter side-path (pure fused vs pure XLA mxu)
    with override(use_fused_preagg=True):
        out1, t_f = timeit(jax.jit(build(G, with_max=False)), args,
                           "fused (no max)")
    with override(use_fused_preagg=False):
        out2, t_x = timeit(jax.jit(build(G, with_max=False)), args,
                           "xla   (no max)")
    print(f"speedup: {t_x / t_f:.2f}x  ({t_x*1e3:.1f} -> {t_f*1e3:.1f} ms; "
          f"{N/t_f/1e6:.0f} Mrows/s fused)")


if __name__ == "__main__":
    main()
