"""Probe: is a Pallas f32 MXU dot EXACT for 24-bit integer operands?

Truth #9 (BASELINE.md round 2) says the fused preagg kernel is VPU-bound on
its V-build; 24-bit limbs into an f32 dot would cut limb rows 8->3 per
int64 sum and 9->3 per float sum IF the MXU's f32 path (bf16x3 passes on
v5e) accumulates 24-bit-integer products exactly.  This probe settles it:
one-hot (0/1) x 24-bit ints, segment sums vs exact numpy.

Usage: python tools/probe_f32dot.py [N_log2] [G]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def make(N, G, TILE, nlimb):
    nsteps = N // TILE

    def kernel(seg_ref, v_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        seg = seg_ref[:].reshape(1, TILE)
        u = v_ref[:].reshape(1, TILE).astype(jnp.uint32)
        oht = (seg == jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 0)
               ).astype(jnp.float32)
        rows = []
        for j in range(nlimb):
            rows.append(((u >> jnp.uint32(24 * j)) & jnp.uint32(0xFFFFFF))
                        .astype(jnp.int32).astype(jnp.float32))
        rows.append(jnp.zeros((LANES - nlimb, TILE), jnp.float32))
        Vt = jnp.concatenate(rows, axis=0)
        acc[:] += jax.lax.dot_general(
            oht, Vt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(step == jnp.int32(nsteps - 1))
        def _():
            out_ref[:] = acc[:]

    lane_spec = pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((G, LANES), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane_spec, lane_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((G, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, LANES), jnp.float32)])


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # per-flush window must keep f32 partial sums exact: 24-bit limbs sum
    # exactly while count*max < 2^24? NO — f32 adds are exact only while
    # the running sum stays < 2^25-ish and aligned; the REAL question is
    # whether sums of many 24-bit terms are exact, which requires the
    # window trick (sum < 2^24 impossible). So test the honest contract:
    # flush window of 256 rows/group max => sum < 2^32... f32 exact ints
    # only to 2^24. Use values < 2^16 and windows < 2^8 so sums < 2^24:
    TILE = 8192
    N = 1 << nlog
    rng = np.random.default_rng(0)
    seg_np = rng.integers(0, G, N).astype(np.int32)
    v_np = rng.integers(0, 1 << 16, N).astype(np.int32)
    f = jax.jit(make(N, G, TILE, 2))
    t0 = time.perf_counter()
    r = np.asarray(jax.device_get(f(jax.device_put(seg_np),
                                    jax.device_put(v_np))))
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ok = True
    u = v_np.astype(np.uint64)
    for g in range(0, G, max(G // 8, 1)):
        m = seg_np == g
        for j in range(2):
            want = float(((u[m] >> (24 * j)) & 0xFFFFFF).sum())
            got = float(r[g, j])
            if want != got:
                ok = False
                print(f"MISMATCH g={g} j={j} want={want} got={got}", flush=True)
    print(f"f32-dot 24-bit-limb segment sums exact={ok} "
          f"(N=2^{nlog}, G={G}; NOTE sums here reach ~2^{nlog - 5 + 16} — "
          f"exactness beyond 2^24 would mean the MXU accumulates f32 "
          f"products in extended precision)", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(jax.device_put(seg_np), jax.device_put(v_np))
                for _ in range(4)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"dt={best*1e3:.2f}ms  {N/best/1e9:.2f} Grows/s", flush=True)


if __name__ == "__main__":
    main()
