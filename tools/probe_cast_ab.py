"""Interleaved A/B of the bool->i8 cast path in the v2 kernel: tunnel
contention drifts minute-to-minute, so the two variants' timing windows
alternate and each takes its own min — the only fair comparison shape on
this service (BASELINE truth #15)."""

from __future__ import annotations

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")


def main():
    from pg_strom_tpu import T
    from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
    from pg_strom_tpu.expr.lower_jax import schema_from_chunk_columns
    from pg_strom_tpu.datastore import column_from_numpy
    from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, \
        build_preagg_fn
    from pg_strom_tpu.ops.preagg_fused2 import derive_v2_plan
    import pg_strom_tpu.ops.preagg_fused2 as pf2

    print(f"# devices: {jax.devices()}", flush=True)
    jax.device_get(jax.jit(lambda v: v * 2)(np.ones(8, np.float32)))

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
    plan = derive_v2_plan(cols_host, schema, [key], insts, pred,
                          max_g=4096)
    cols = ((jax.device_put(key_np), jax.device_put(np.ones(N, np.bool_))),
            (jax.device_put(x_np), jax.device_put(xv_np)),
            (jax.device_put(y_np), jax.device_put(yv_np)))
    ylo = (y_np.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    yhi = (y_np.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    scal = {"i": plan.scal_i, "u": plan.scal_u, "f4sc": plan.f4sc,
            "f4e": plan.f4e,
            "split": {2: (jax.device_put(ylo), jax.device_put(yhi))}}
    args = (cols, np.int32(N), np.uint64(0), scal)

    fns = {}
    for label, oh, tile in (("rep64k", "rep", 65536),
                            ("const64k", "const", 65536),
                            ("rep128k", "rep", 131072)):
        pf2.ONEHOT_MODE = oh
        pf2.MAX_TILE = tile
        try:
            fns[label] = jax.jit(build_preagg_fn(
                schema, [key], insts, pred, plan.G,
                strategy="mxu_dense", v2sig=plan.sig))
            out = fns[label](*args)
            jax.device_get(out["err"])
            print(f"# {label} compiled+warm", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# {label} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            fns.pop(label, None)

    best = {cm: float("inf") for cm in fns}
    for r in range(6):
        for cm, fn in fns.items():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(8)]
            jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0])
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / 8
            best[cm] = min(best[cm], dt)
            print(f"# round {r} {cm}: {dt*1e3:.2f} ms", flush=True)
    for cm, dt in best.items():
        print(f"# BEST {cm}: {dt*1e3:.2f} ms "
              f"(vs_baseline {N/dt/(819e9/19):.4f})", flush=True)


if __name__ == "__main__":
    main()
