"""Dispatch-floor amortization probe (round-5 verdict item 7).

Truth #0: ~3.8 ms of every launch is fixed dispatch overhead; at the
flagship's 9.4 ms/2^26 that is ~40% of the budget.  This probe runs the
EXACT flagship v2 kernel (same derive, same args as bench.py) at
N = 2^26 / 2^27 / 2^28 rows per single dispatch and reports ms per 2^26
rows.  If the fixed cost amortizes, ms/2^26 at 2^28 should approach the
~6 ms kernel-work floor (=> ~0.26 SoL); if it does not move, the
"per-launch" floor is really per-grid-step machinery and a new BASELINE
truth pins it as irreducible.

Usage: python tools/probe_superchunk.py <log2_rows>   (one N per process —
fresh-subprocess discipline per the poisoned-compile hazard.)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    N = 1 << lg
    import pg_strom_tpu  # noqa: F401
    import jax
    from pg_strom_tpu import T
    from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
    from pg_strom_tpu.expr.lower_jax import schema_from_chunk_columns
    from pg_strom_tpu.datastore import column_from_numpy
    from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, \
        build_preagg_fn
    from pg_strom_tpu.ops.preagg_fused2 import derive_v2_plan

    dev = jax.devices()[0]
    print(f"# device={dev} N=2^{lg}", file=sys.stderr)

    rng = np.random.default_rng(0)
    key_np = rng.integers(0, 30, N).astype(np.int32)
    x_np = rng.random(N).astype(np.float32)
    xv_np = rng.random(N) > 0.05
    y_np = rng.integers(0, 1 << 40, N).astype(np.int64)
    yv_np = rng.random(N) > 0.05
    cols_host = [column_from_numpy(T.INT4, key_np),
                 column_from_numpy(T.FLOAT4, x_np, xv_np),
                 column_from_numpy(T.INT8, y_np, yv_np)]
    names = ["key", "x", "y"]
    schema = schema_from_chunk_columns(names, cols_host)
    key = ColumnRef(type=T.INT4, name="key", index=0)
    x = ColumnRef(type=T.FLOAT4, name="x", index=1)
    y = ColumnRef(type=T.INT8, name="y", index=2)
    pred = resolve_function(">", (x, Const(type=T.FLOAT4, value=0.25)))
    insts = []
    for aggname, arg in (("sum", x), ("count", x), ("sum", y)):
        d, fam = lookup_agg(aggname, (arg.type,))
        insts.append(AggInstance(aggname=aggname, family=fam,
                                 slots=d.slots, args=(arg,)))

    t0 = time.perf_counter()
    plan = derive_v2_plan(cols_host, schema, [key], insts, pred,
                          max_g=4096)
    assert plan is not None
    print(f"# derive {time.perf_counter()-t0:.1f}s G={plan.G}",
          file=sys.stderr)
    fn = jax.jit(build_preagg_fn(schema, [key], insts, pred, plan.G,
                                 strategy="mxu_dense", v2sig=plan.sig))

    ylo = (y_np.view(np.uint64) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    yhi = (y_np.view(np.uint64) >> np.uint64(32)).astype(np.uint32)
    t0 = time.perf_counter()
    cols = ((jax.device_put(key_np),
             jax.device_put(np.ones(N, dtype=np.bool_))),
            (jax.device_put(x_np), jax.device_put(xv_np)),
            (jax.device_put(y_np), jax.device_put(yv_np)))
    scal = {"i": plan.scal_i, "u": plan.scal_u, "f4sc": plan.f4sc,
            "f4e": plan.f4e,
            "split": {2: (jax.device_put(ylo), jax.device_put(yhi))}}
    print(f"# upload {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = fn(cols, np.int32(N), np.uint64(0), scal)
    err = int(jax.device_get(out["err"]))
    print(f"# compile+first {time.perf_counter()-t0:.1f}s err={err}",
          file=sys.stderr)

    window = max(1, (1 << 29) // N)       # same total rows per window
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [fn(cols, np.int32(N), np.uint64(0), scal)
                for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    per26 = best * (1 << 26) / N
    grows = N / best / 1e9
    sol = 819e9 / 18                       # bytes/row as bench.py
    print(f"lg={lg} best={best*1e3:.2f}ms per2^26={per26*1e3:.2f}ms "
          f"{grows:.2f}Grows/s vs_sol={N/best/sol:.4f}")


if __name__ == "__main__":
    main()
