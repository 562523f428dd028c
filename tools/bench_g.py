"""Probe: flagship fused preagg kernel cost vs bucket count G.

Same query as bench.py; G from argv. Fresh process per G (BASELINE truth #5).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax

from pg_strom_tpu import T
from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
from pg_strom_tpu.expr.lower_jax import ColMeta
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, build_preagg_fn


def main() -> None:
    G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    N = 1 << 24
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
    fn = jax.jit(build_preagg_fn(schema, [key], insts, pred, G=G,
                                 strategy="mxu"))
    rng = np.random.default_rng(0)
    cols = (
        (jax.device_put(rng.integers(0, 30, N).astype(np.int32)),
         jax.device_put(np.ones(N, dtype=np.bool_))),
        (jax.device_put(rng.random(N).astype(np.float32)),
         jax.device_put((rng.random(N) > 0.05))),
        (jax.device_put(rng.integers(0, 1 << 40, N).astype(np.int64)),
         jax.device_put((rng.random(N) > 0.05))),
    )
    nrows = np.int32(N)
    t0 = time.perf_counter()
    out = fn(cols, nrows, np.uint64(0))
    err = int(jax.device_get(out["err"]))
    print(f"# compile+first+fetch: {time.perf_counter()-t0:.1f}s err={err}")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(cols, nrows, np.uint64(0)) for _ in range(8)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"G={G}: {best*1e3:.2f} ms  ({N/best/1e9:.2f} Grows/s)")


if __name__ == "__main__":
    main()
