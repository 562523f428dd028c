"""Bisect the fused preagg flagship time: XLA lane-encode vs Pallas kernel.

Stages timed separately (device-resident args, fetch-first truth mode):
  full    — build_preagg_fn flagship (the bench.py number)
  encode  — the XLA lane-encoding half of fused_mxu_reduce (inputs list),
            reduced with a cheap checksum so nothing dead-codes
  kernel  — the Pallas kernel alone on pre-encoded device inputs
  epilog  — the full fused_mxu_reduce minus kernel (defers to full-enc diff)

Usage: python tools/profile_fused.py [N_log2] [G]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pg_strom_tpu import T
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
from pg_strom_tpu.expr.lower_jax import ColMeta
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, build_preagg_fn


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms")
    return best


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    N = 1 << nlog

    schema = [ColMeta("key", T.INT4), ColMeta("x", T.FLOAT4),
              ColMeta("y", T.INT8)]
    key = ColumnRef(type=T.INT4, name="key", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    pred = resolve_function(">", (x, Const(type=T.FLOAT4, value=0.25)))
    insts = []
    for aggname, arg in (("sum", x), ("count", x), ("sum", y)):
        d, fam = lookup_agg(aggname, (arg.type,))
        insts.append(AggInstance(aggname=aggname, family=fam,
                                 slots=d.slots, args=(arg,)))

    rng = np.random.default_rng(0)
    cols = (
        (jax.device_put(rng.integers(0, 30, N).astype(np.int32)),
         jax.device_put(np.ones(N, dtype=np.bool_))),
        (jax.device_put(rng.random(N).astype(np.float32)),
         jax.device_put(rng.random(N) > 0.05)),
        (jax.device_put(rng.integers(0, 1 << 40, N).astype(np.int64)),
         jax.device_put(rng.random(N) > 0.05)),
    )
    nrows = np.int32(N)

    fn = jax.jit(build_preagg_fn(schema, [key], insts, pred, G,
                                 strategy="mxu"))
    timeit(fn, (cols, nrows, np.uint64(0)), "full")

    # --- encode-only: replicate fused_mxu_reduce's input build -------------
    from pg_strom_tpu.ops import preagg_fused as pf
    from pg_strom_tpu.expr.lower_jax import Lowerer

    key_types = [T.INT4]
    arg_types = [(T.FLOAT4,), (T.FLOAT4,), (T.INT8,)]
    plan, S = pf._plan_cached((T.INT4,),
                              tuple(tuple(i.slots) for i in insts),
                              tuple(arg_types), True)
    print(f"plan: n_inputs={plan.n_inputs} ncols={plan.ncols} S={S}")

    def encode(cols, nrows):
        n = cols[0][0].shape[0]
        live = jnp.arange(n, dtype=jnp.int32) < nrows
        lw = Lowerer(schema, cols, live)
        pv = lw.lower(pred, live)
        mask = live & pv.valid & pv.data.astype(jnp.bool_)
        kv = lw.lower(key, mask)
        seg = jnp.where(mask & kv.valid,
                        kv.data.astype(jnp.int32) % G, G).astype(jnp.int32)
        vals = [tuple(lw.lower(a, mask) for a in inst.args)
                for inst in insts]
        kvs = [kv]
        # reproduce input encoding (copy of fused_mxu_reduce front half)
        out = pf.fused_mxu_reduce(kvs, insts, vals, mask, seg, G, n,
                                  key_types, arg_types)
        return out

    timeit(jax.jit(encode), (cols, nrows), "reduce(enc+kern+epi)")

    # --- kernel-only on pre-encoded inputs ----------------------------------
    TILE = pf._pick_tile(G, N)
    kern = pf._build_kernel(plan, N, G, TILE)
    seg_d = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    ins = [jax.device_put(rng.integers(0, 1 << 30, N).astype(np.uint32))
           if i % 3 != 2 else
           jax.device_put((rng.random(N) > 0.5))
           for i in range(plan.n_inputs)]
    # match dtypes the plan expects: bool lanes vs u32 vs f32 — infer from ops
    ins = [None] * plan.n_inputs
    for op in plan.ops:
        if op[0] == "mask":
            continue
        if op[0] == "bool":
            ins[op[1]] = jax.device_put((rng.random(N) > 0.5))
        elif op[0] in ("limbs4", "ksq12"):
            ins[op[1]] = jax.device_put(
                rng.integers(0, 1 << 30, N).astype(np.uint32))
        elif op[0] == "f4s":
            ins[op[1]] = jax.device_put(
                (rng.random(N) - 0.5).astype(np.float32))
        else:                      # f32 / fabs
            ins[op[1]] = jax.device_put(rng.random(N).astype(np.float32))
    sc = jax.device_put(np.ones((1, max(plan.n_f4, 1)), np.float32))

    def kern_only(seg, ins, sc):
        return kern(seg, *ins, sc)

    timeit(jax.jit(kern_only), (seg_d, ins, sc), "kernel-only")

    # --- one-hot matmul floor (no V build): same dot shape ------------------
    def dot_floor(seg, v):
        TILEf = TILE
        def step(acc, i):
            s = jax.lax.dynamic_slice(seg, (i * TILEf,), (TILEf,))
            vv = jax.lax.dynamic_slice(v, (0, i * TILEf), (128, TILEf))
            oht = (s[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (G, TILEf), 0)).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                oht, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), None
        acc0 = jnp.zeros((G, 128), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0,
                              jnp.arange(N // TILEf, dtype=jnp.int32))
        return acc

    vbig = jax.device_put(rng.random((128, N)).astype(np.bfloat16))
    timeit(jax.jit(dot_floor), (seg_d, vbig), "xla-dot-floor")


if __name__ == "__main__":
    main()
