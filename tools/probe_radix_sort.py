"""Feasibility probes for a TPU-native (Pallas) radix/bitonic sort
(round-4 verdict item 7: sort sits at 0.005 SoL on lax.sort and has never
had a TPU-first attempt).

The two candidate designs and their blockers:

A. MSB radix partition (histogram -> per-tile bucket runs DMA'd to global
   offsets).  Blocker: per-run DMAs need DYNAMIC LENGTH (run sizes are
   data-dependent) — probe 1 tests whether Mosaic accepts a traced size in
   `ref.at[pl.ds(off, n)]`; probe 2 measures static-size dynamic-OFFSET
   VMEM->HBM DMA throughput (the padded-run variant's primitive).

B. Bitonic tile sort + merge ladder (deadcode/opencl_gpusort.h analog).
   Blocker: cross-lane compare-exchange needs an in-register rotate —
   probe 3 measures a pltpu.roll-based compare-exchange stage rate.

Run on the live chip: python tools/probe_radix_sort.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def timed(fn, args, window=8, rounds=3, label=""):
    out = fn(*args)
    # a real FETCH, not block_until_ready: the tunnel defers compile+exec
    # until the first device->host read (BASELINE truth #1)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0])
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"# {label}: {best*1e3:.3f} ms", flush=True)
    return best


def probe_dynamic_len_dma():
    """Does Mosaic accept a TRACED copy length in a DMA slice?"""
    TILE = 8192

    def kernel(n_ref, x_ref, o_ref, sem):
        n = n_ref[0]
        dma = pltpu.make_async_copy(x_ref.at[pl.ds(0, n)],
                                    o_ref.at[pl.ds(0, n)], sem)
        dma.start()
        dma.wait()

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((TILE,), jnp.int32),
    )
    try:
        x = jnp.arange(TILE, dtype=jnp.int32)
        out = jax.jit(f)(np.asarray([1000], np.int32), x)
        out = jax.device_get(out)
        ok = bool((out[:1000] == np.arange(1000)).all())
        print(f"# dynamic-length DMA: LEGAL, correct={ok}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"# dynamic-length DMA: REJECTED ({type(e).__name__}: "
              f"{str(e)[:2000]})", flush=True)
        return False


def probe_dynamic_offset_dma():
    """Static-size, dynamic-offset VMEM->HBM DMA append rate: the padded
    radix-partition primitive.  Each grid step writes one 2048-elem run at
    a data-dependent offset."""
    TILE = 2048
    STEPS = 2048                      # 4M elems total

    def kernel(off_ref, x_ref, o_ref, buf, sem):
        i = pl.program_id(0)
        buf[:] = x_ref[:] + i
        dma = pltpu.make_async_copy(
            buf, o_ref.at[pl.ds(off_ref[i], TILE)], sem)
        dma.start()
        dma.wait()

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(STEPS,),
            in_specs=[pl.BlockSpec((TILE,), lambda i, s: (i * 0,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((TILE,), jnp.int32),
                            pltpu.SemaphoreType.DMA(())]),
        out_shape=jax.ShapeDtypeStruct((TILE * STEPS,), jnp.int32),
    )
    rng = np.random.default_rng(0)
    # a permutation of run slots: worst-case scattered append order
    offs = (rng.permutation(STEPS) * TILE).astype(np.int32)
    x = jnp.zeros(TILE, jnp.int32)
    try:
        fj = jax.jit(f)
        dt = timed(fj, (offs, x), label="dyn-offset DMA append (4M i32)")
        n = TILE * STEPS
        print(f"#   -> {n/dt/1e9:.2f} Gelem/s ({n*4/dt/1e9:.1f} GB/s write)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# dyn-offset DMA: REJECTED ({type(e).__name__}: "
              f"{str(e)[:2000]})", flush=True)


def probe_roll_stage():
    """One bitonic compare-exchange stage over a (8, 128) register tile
    via pltpu.roll: measures the per-stage cost that a full bitonic ladder
    would multiply by ~log^2(n)."""
    TILE = 32768
    P, T4 = 8, 4096
    STEPS = 512
    REPS = 16                          # stages per step

    def kernel(x_ref, o_ref):
        v = x_ref[:].reshape(P, T4)
        for r in range(REPS):
            s = pltpu.roll(v, 1 << (r % 5), 1)
            mx = jnp.maximum(v, s)
            mn = jnp.minimum(v, s)
            lane = jax.lax.broadcasted_iota(jnp.int32, (P, T4), 1)
            take_max = (lane >> (r % 5)) & jnp.int32(1)
            v = jnp.where(take_max == jnp.int32(1), mx, mn)
        o_ref[:] = v.reshape(TILE)

    f = pl.pallas_call(
        kernel, grid=(STEPS,),
        in_specs=[pl.BlockSpec((TILE,), lambda i: (i * 0,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i * 0,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILE,), jnp.int32),
    )
    x = jnp.arange(TILE, dtype=jnp.int32)
    try:
        dt = timed(jax.jit(f), (x,), label=f"roll compare-exchange "
                   f"({REPS} stages x {STEPS} steps on 32k-tiles)")
        per_stage = dt / (STEPS * REPS)
        # full bitonic sort of n=2^24: log^2 term ~ 300 stages over the
        # whole array (each a full pass)
        est = per_stage * (TILE and 1) * 300 * ((1 << 24) // TILE)
        print(f"#   -> {per_stage*1e6:.2f} us/stage/32k-tile; naive full "
              f"bitonic 16M estimate ~{est*1e3:.0f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# roll stage: REJECTED ({type(e).__name__}: "
              f"{str(e)[:2000]})", flush=True)


def lax_sort_reference():
    n = 1 << 24
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.integers(0, 1 << 62, n).astype(np.int64))
    f = jax.jit(lambda a: jnp.sort(a))
    dt = timed(f, (k,), window=4, label="lax.sort 16M i64 (reference)")
    print(f"#   -> {n/dt/1e6:.0f} Mrows/s", flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    jax.device_get(jax.jit(lambda v: v * 2)(np.ones(8, np.float32)))
    probe_dynamic_len_dma()
    probe_dynamic_offset_dma()
    probe_roll_stage()
    lax_sort_reference()


if __name__ == "__main__":
    main()
