"""Round-4 flagship cost attribution: time REAL v2 plans of increasing
width at 2^26 rows to attribute cycles between the fixed floor (input
read + live/seg + one-hot + dots) and each column family's V-build.

  count(x) only          -> K=2  (mask + cnt): the floor
  count(x)+sum(y)        -> adds the int8(biased) 5-limb family
  count(x)+sum(x)        -> adds the float4 7-bit digit family
  flagship (all three)   -> cross-check

Run AFTER other TPU work drains (tunnel contention poisons numbers).
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")


def timed(fn, args, window=8, rounds=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0])
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    return best


def main():
    from pg_strom_tpu import T
    from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
    from pg_strom_tpu.expr.lower_jax import schema_from_chunk_columns
    from pg_strom_tpu.datastore import column_from_numpy
    from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, \
        build_preagg_fn
    from pg_strom_tpu.ops.preagg_fused2 import derive_v2_plan

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

    dev = {}
    dev["key"] = (jax.device_put(key_np),
                  jax.device_put(np.ones(N, np.bool_)))
    dev["x"] = (jax.device_put(x_np), jax.device_put(xv_np))
    dev["y"] = (jax.device_put(y_np), jax.device_put(yv_np))
    ylo = (y_np.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    yhi = (y_np.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    ysplit = (jax.device_put(ylo), jax.device_put(yhi))

    def one(label, agg_list, use_pred=True):
        insts = []
        for aggname, arg in agg_list:
            d, fam = lookup_agg(aggname, (arg.type,) if arg is not None
                                else ())
            insts.append(AggInstance(aggname=aggname, family=fam,
                                     slots=d.slots,
                                     args=(arg,) if arg is not None else ()))
        qpred = pred if use_pred else None
        plan = derive_v2_plan(cols_host, schema, [key], insts, qpred,
                              max_g=4096)
        assert plan is not None, label
        fn = jax.jit(build_preagg_fn(schema, [key], insts, qpred, plan.G,
                                     strategy="mxu_dense", v2sig=plan.sig))
        cols = (dev["key"], dev["x"], dev["y"])
        scal = {"i": plan.scal_i, "u": plan.scal_u, "f4sc": plan.f4sc,
                "f4e": plan.f4e,
                "split": ({2: ysplit} if 2 in plan.split_cols else {})}
        dt = timed(fn, (cols, np.int32(N), np.uint64(0), scal))
        print(f"# {label}: K={plan.sig.ncols} i8={plan.sig.i8} "
              f"{dt*1e3:.2f} ms ({dt*940e6/ (N//65536):.0f} cyc/step)",
              flush=True)
        return dt

    one("nrows_only   ", [("count", None)], use_pred=False)
    one("count_x_only ", [("count", x)])
    one("flagship     ", [("sum", x), ("count", x), ("sum", y)])


if __name__ == "__main__":
    main()
