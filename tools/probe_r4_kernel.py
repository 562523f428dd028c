"""Round-4 kernel probes, batched in ONE process (the first device fetch
costs 90-180s of axon service init — BASELINE.md truth #16).

1. Flagship v2 timing at 2^26 after the stats-elision work (K 18 -> 14).
2. int8 vs bf16 MXU dot microbenchmark inside a pallas kernel shaped like
   the v2 inner loop — decides whether the int8/7-bit-digit pipeline is
   worth building (v5e datasheet says 2x int8 OPS; truth #0 measured
   equal STREAM rate for the one-hot contraction — settle it).
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
    jax.block_until_ready(out)            # fetch once: truth #1
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"# {label}: {best*1e3:.2f} ms", flush=True)
    return best


def flagship():
    from pg_strom_tpu import T
    from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
    from pg_strom_tpu.expr.lower_jax import schema_from_chunk_columns
    from pg_strom_tpu.datastore import column_from_numpy
    from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, \
        build_preagg_fn
    from pg_strom_tpu.ops.preagg_fused2 import derive_v2_plan

    N = 1 << 26
    rng = np.random.default_rng(0)
    key_np = rng.integers(0, 30, N).astype(np.int32)
    x_np = rng.random(N).astype(np.float32)
    xv_np = rng.random(N) > 0.05
    y_np = rng.integers(0, 1 << 40, N).astype(np.int64)
    yv_np = rng.random(N) > 0.05
    cols_host = [column_from_numpy(T.INT4, key_np),
                 column_from_numpy(T.FLOAT4, x_np, xv_np),
                 column_from_numpy(T.INT8, y_np, yv_np)]
    schema = schema_from_chunk_columns(["key", "x", "y"], cols_host)
    key = ColumnRef(type=T.INT4, name="key", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    pred = resolve_function(">", (x, Const(type=T.FLOAT4, value=0.25)))
    insts = []
    for aggname, arg in (("sum", x), ("count", x), ("sum", y)):
        d, fam = lookup_agg(aggname, (arg.type,))
        insts.append(AggInstance(aggname=aggname, family=fam,
                                 slots=d.slots, args=(arg,)))
    plan = derive_v2_plan(cols_host, schema, [key], insts, pred, max_g=4096)
    print(f"# plan: K={plan.sig.ncols} S={plan.sig.S} ops={plan.sig.ops}",
          flush=True)
    fn = jax.jit(build_preagg_fn(schema, [key], insts, pred, plan.G,
                                 strategy="mxu_dense", v2sig=plan.sig))
    cols = ((jax.device_put(key_np), jax.device_put(np.ones(N, np.bool_))),
            (jax.device_put(x_np), jax.device_put(xv_np)),
            (jax.device_put(y_np), jax.device_put(yv_np)))
    ylo = (y_np.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    yhi = (y_np.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    scal = {"i": plan.scal_i, "u": plan.scal_u, "f4sc": plan.f4sc,
            "f4e": plan.f4e,
            "split": {2: (jax.device_put(ylo), jax.device_put(yhi))}}
    t0 = time.perf_counter()
    out = fn(cols, np.int32(N), np.uint64(0), scal)
    err = int(jax.device_get(out["err"]))
    print(f"# flagship first fetch: {time.perf_counter()-t0:.1f}s err={err}",
          flush=True)
    # sanity: exact value checks against numpy for bucket 0
    from pg_strom_tpu.ops.preagg_mxu import mxu_extract_slot
    out_h = jax.device_get(out)
    sums = np.asarray(out_h["mxu_sums"])
    m = (x_np > 0.25) & xv_np
    ok0 = m & (key_np == 0)
    assert int(sums[0, 0]) == int(ok0.sum()), (sums[0, 0], ok0.sum())
    oky0 = m & yv_np & (key_np == 0)
    want_y = int(y_np[oky0].sum())
    got_y = mxu_extract_slot(plan.recipes[2]["sum_i"], out_h, 0)["sum_i"]
    assert got_y == want_y, (got_y, want_y)
    want_x = float(x_np[ok0].astype(np.float64).sum())
    got_x = mxu_extract_slot(plan.recipes[0]["sum_f"], out_h, 0)["sum_f"]
    assert abs(got_x - want_x) <= 1e-4 * abs(want_x), (got_x, want_x)
    print(f"# value sanity OK (i8={plan.sig.i8}): count/sum_i exact, "
          f"sum_f rel err {(got_x-want_x)/want_x:.2e}", flush=True)
    dt = timed(fn, (cols, np.int32(N), np.uint64(0), scal), label="flagship")
    print(f"# flagship: {N/dt/1e9:.2f} Grows/s  vs_baseline="
          f"{N/dt/(819e9/19):.4f}", flush=True)


def dot_probe(dtype_name):
    """Pallas kernel: build oh (256,T4) + V (128,T4) from iota in-kernel,
    run the v2 dot pattern R times per grid step; grid long enough that
    per-kernel overheads vanish.  Compare dtypes by total time."""
    TILE = 32768
    P = 8
    T4 = TILE // P
    GP, SKL = 256, 128
    R = 4
    STEPS = 2048
    dt = {"bf16": jnp.bfloat16, "i8": jnp.int8}[dtype_name]
    acc_dt = jnp.float32 if dtype_name == "bf16" else jnp.int32

    def kernel(o_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            acc[:] = jnp.zeros_like(acc)

        i0 = jax.lax.broadcasted_iota(jnp.int32, (GP, T4), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (GP, T4), 1)
        oh = ((i1 + step) % jnp.int32(97) == (i0 % jnp.int32(97)))
        ohd = oh.astype(jnp.int32).astype(dt)
        v = ((i1 * jnp.int32(13) + i0) & jnp.int32(0x7F)).astype(dt)[:SKL]
        for r in range(R):
            for sg in range(GP // 128):
                g0 = sg * 128
                acc[g0:g0 + 128, :] += jax.lax.dot_general(
                    ohd[g0:g0 + 128], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_dt)

        @pl.when(step == jnp.int32(STEPS - 1))
        def _():
            o_ref[:] = acc[:].astype(jnp.float32)

    f = pl.pallas_call(
        kernel, grid=(STEPS,),
        in_specs=[],
        out_specs=pl.BlockSpec((GP, SKL), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GP, SKL), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GP, SKL), acc_dt)],
    )
    fj = jax.jit(f)
    try:
        dtm = timed(fj, (), label=f"dot_{dtype_name} (R={R}, {STEPS} steps)")
        # cycles/step estimate at 940 MHz
        print(f"#   -> {dtm/STEPS/R*940e6*1e0:.0f} cyc per dot-pass "
              f"(2 dots of (128,{T4})x({T4},128))", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# dot_{dtype_name} FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda v: v * 2)(np.ones(8, np.float32)))
    print(f"# service init fetch: {time.perf_counter()-t0:.1f}s", flush=True)
    from pg_strom_tpu.config import override
    for i8 in (True, False):
        print(f"# === int8={i8} ===", flush=True)
        try:
            with override(use_preagg_int8=i8):
                flagship()
        except Exception as e:  # noqa: BLE001
            print(f"# int8={i8} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
