"""Profile the flagship preagg kernel's pieces: V build vs one-hot dot.

Fresh-process probe (BASELINE env truths): fetch once before timing.
Flagship query shape: group by int4 key; sum(f32 x), count(x), sum(i64 y).
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
from pg_strom_tpu.expr.lower_jax import ColMeta, Lowerer
from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg
from pg_strom_tpu.ops import preagg_mxu as M


def timeit(fn, args, tag, rounds=3, window=4):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms", file=sys.stderr)
    return best


def main():
    N = 1 << 24
    G = 256
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
         jax.device_put((rng.random(N) > 0.05))),
        (jax.device_put(rng.integers(0, 1 << 40, N).astype(np.int64)),
         jax.device_put((rng.random(N) > 0.05))),
    )

    def build_V(c, nrows):
        n = N
        live = jnp.arange(n, dtype=jnp.int32) < nrows
        lw = Lowerer(schema, c, live)
        pv = lw.lower(pred, live)
        mask = live & pv.valid & pv.data.astype(jnp.bool_)
        kv = [lw.lower(key, mask)]
        av = [tuple(lw.lower(a, mask) for a in inst.args) for inst in insts]
        V, exps = M.build_mxu_columns(kv, insts, av, mask, n)
        return V, exps

    def build_then_sum(c, nrows):
        V, exps = build_V(c, nrows)
        # cheap consume: row-sum (forces V materialization but no matmul)
        return jnp.sum(V.astype(jnp.float32), axis=0), exps

    def full(c, nrows):
        V, exps = build_V(c, nrows)
        h = jnp.full((N,), np.uint32(2654435761), jnp.uint32)
        seg = (jax.lax.convert_element_type(c[0][0], jnp.uint32) *
               h).astype(jnp.uint32) % jnp.uint32(G)
        sums, fsums = M.mxu_reduce(V, seg.astype(jnp.int32), G, N,
                                   fsum_cols=[0])
        return sums, fsums

    t_build = timeit(jax.jit(build_then_sum), (cols, np.int32(N)), "V build (+row-sum)")
    t_full = timeit(jax.jit(full), (cols, np.int32(N)), "V build + one-hot dot")
    S = jax.eval_shape(jax.jit(build_V), cols, np.int32(N))[0].shape
    print(f"V shape: {S}", file=sys.stderr)


if __name__ == "__main__":
    main()
