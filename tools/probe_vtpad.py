"""Probe 3: cost of zero-padding Vt to 128 lanes every grid step.

Variants (int8 dot, i32-compare one-hot, 5 limb cols):
  concat   — jnp.concatenate([limbs, zeros(123,TILE)]) per step (current)
  scratch  — persistent (LANES,TILE) VMEM scratch zeroed at step 0; only
             rows [0:5] written per step
  nopad    — dot with Vt = (8,TILE) (5 limbs + 3 zero rows), acc (G,8)
  nolimb   — concat variant but limbs replaced by 5 broadcasts of v's low
             byte (isolates the limb-extraction VPU cost)

Usage: python tools/probe_vtpad.py [N_log2] [G] [TILE] [variants]
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
    r = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s "
          f"chk={np.asarray(r).reshape(-1)[:2]}", flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms  {args[0].shape[0]/best/1e9:.2f} Grows/s",
          flush=True)
    return best


def make(kind: str, N: int, G: int, TILE: int):
    nsteps = N // TILE
    KC = 8 if kind == "nopad" else LANES

    def kernel(seg_ref, v_ref, out_ref, acc, vts):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)
            if kind == "scratch":
                vts[:] = jnp.zeros_like(vts)

        seg = seg_ref[:].reshape(1, TILE)
        v = v_ref[:].reshape(1, TILE)
        u = v.astype(jnp.uint32)
        if kind == "nolimb":
            limbs = jnp.broadcast_to(
                (u & jnp.uint32(0x7F)).astype(jnp.int8), (5, TILE))
        else:
            sh = (jax.lax.broadcasted_iota(jnp.uint32, (5, TILE), 0)
                  * jnp.uint32(7))
            limbs = ((u >> sh) & jnp.uint32(0x7F)).astype(jnp.int8)

        if kind == "dotonly":
            # no compare: broadcast one int8 row (gen cost ~a broadcast)
            oht = jnp.broadcast_to(v.astype(jnp.int8) & jnp.int8(1),
                                   (G, TILE))
        else:
            iota = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
            oht = (seg == iota).astype(jnp.int8)

        if kind == "scratch":
            vts[0:5] = limbs
            Vt = vts[:]
        elif kind == "nopad":
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((3, TILE), jnp.int8)], axis=0)
        else:
            Vt = jnp.concatenate(
                [limbs, jnp.zeros((LANES - 5, TILE), jnp.int8)], axis=0)

        if kind == "nodot":
            acc[:] += (jnp.sum(oht[0:8, :], axis=1, keepdims=True)
                       .astype(jnp.int32)
                       + jnp.sum(Vt[0:5, :].astype(jnp.int32)) * jnp.int32(0))
        else:
            acc[:] += jax.lax.dot_general(
                oht, Vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc[:].astype(jnp.float32)

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, KC), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane_spec, lane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, KC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, KC), jnp.int32),
                        pltpu.VMEM((LANES if kind == "scratch" else 8, TILE),
                                   jnp.int8)],
    )


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
    N = 1 << nlog
    rng = np.random.default_rng(0)
    seg = jax.device_put(rng.integers(0, G, N).astype(np.int32))
    v = jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32))

    kinds = (sys.argv[4].split(",") if len(sys.argv) > 4 else
             ["dotonly", "nodot"])
    for kind in kinds:
        try:
            f = jax.jit(make(kind, N, G, TILE))
            timeit(f, (seg, v), kind)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
