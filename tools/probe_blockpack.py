"""Probe 4: block-diagonal packed one-hot dot.

The MXU consumes one 128-value contraction column per cycle per MXU; a
(G,TILE)x(TILE,K) one-hot dot with G=K=32 wastes 3/4 of each column.  Pack
P = 128//max(G,K) rows per column block-diagonally:

  column t carries rows r_0..r_{P-1}: oh(r_p) at sublanes [G*p, G*p+G),
  v(r_p) limbs at lanes [K*p, K*p+K).  The rank-1 outer product adds all
  (i,j) cross blocks, but the wanted sums land in the P diagonal blocks;
  cross blocks are garbage in acc regions we never read.  Result =
  sum_p acc[G*p:G*p+G, K*p:K*p+K]  ->  P-fold fewer MXU cycles.

Variants:
  pack1  — P=1 (the current kernel, reference result)
  pack2/pack4 — P=2/4 (requires G*P<=128, K*P<=128)

Checks bit-equality of the (G,K) int32 sums vs pack1.
Usage: python tools/probe_blockpack.py [N_log2] [G] [TILE] [K]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    r = np.asarray(jax.device_get(out))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms  {args[0].shape[0]/best/1e9:.2f} Grows/s",
          flush=True)
    return best, r


def make(P: int, N: int, G: int, TILE: int, K: int):
    import os
    NODOT = os.environ.get("NODOT", "0") == "1"
    nsteps = N // TILE
    T4 = TILE // P
    assert G * P <= LANES and K * P <= LANES

    def kernel(seg_ref, v_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        seg = seg_ref[:].reshape(P, T4)
        v = v_ref[:].reshape(P, T4)
        u = v.astype(jnp.uint32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (G, T4), 0)
        sh = (jax.lax.broadcasted_iota(jnp.uint32, (K, T4), 0)
              * jnp.uint32(7)) % jnp.uint32(35)

        oh_blocks = []
        v_blocks = []
        for p in range(P):
            oh_blocks.append((seg[p:p + 1, :] == iota).astype(jnp.int8))
            v_blocks.append(((u[p:p + 1, :] >> sh) & jnp.uint32(0x7F))
                            .astype(jnp.int8))
        if G * P < LANES:
            oh_blocks.append(jnp.zeros((LANES - G * P, T4), jnp.int8))
        if K * P < LANES:
            v_blocks.append(jnp.zeros((LANES - K * P, T4), jnp.int8))
        oht = jnp.concatenate(oh_blocks, axis=0)
        Vt = jnp.concatenate(v_blocks, axis=0)

        if NODOT:
            acc[:] += (jnp.sum(oht.astype(jnp.int32), axis=1,
                               keepdims=True, dtype=jnp.int32)
                       + jnp.sum(Vt.astype(jnp.int32), axis=1,
                                 keepdims=True, dtype=jnp.int32))
        else:
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc[:]

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((LANES, LANES), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane_spec, lane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((LANES, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((LANES, LANES), jnp.int32)],
    )

    def run(seg, v):
        full = f(seg, v)
        r = jnp.zeros((G, K), jnp.int32)
        for p in range(P):
            r = r + jax.lax.dynamic_slice(full, (G * p, K * p), (G, K))
        return r

    return run


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    N = 1 << nlog
    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    v = jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32))

    ref = None
    for P in (1, 2, 4):
        if G * P > LANES or K * P > LANES:
            continue
        try:
            f = jax.jit(make(P, N, G, TILE, K))
            _, r = timeit(f, (seg, v), f"pack{P}")
            if ref is None:
                ref = r
            else:
                ok = np.array_equal(ref, r)
                print(f"pack{P}: exact={ok}", flush=True)
                if not ok:
                    print(ref[:3, :5], r[:3, :5], flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pack{P}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
