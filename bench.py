"""Benchmark: flagship operator throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": F}

The headline metric is fused filter+grouped-aggregate rows/s/chip on
device-resident columnar data (the GpuPreAgg hot path — BASELINE.md names
rows/s/chip per operator as the driver metric).  vs_baseline normalizes
against the HBM-bandwidth speed-of-light for the bytes each row touches
(BASELINE.md: "each operator HBM-bandwidth bound"), so 1.0 = memory-bound
perfection on this chip.  The reference publishes no numbers (BASELINE.md),
so speed-of-light is the yardstick.

Secondary per-operator numbers (filter / join / agg / sort) go to stderr so
the driver's one-line contract holds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _device_hbm_gbps(dev) -> float:
    """Nominal HBM bandwidth by device kind (the denominator of
    vs_baseline; recorded on stderr so the assumption travels with the
    number).  Source: public TPU spec sheets."""
    kind = getattr(dev, "device_kind", "").lower()
    table = {
        "v5 lite": 819e9, "v5e": 819e9,
        "v5p": 2765e9, "v5": 2765e9,
        "v4": 1228e9,
        "v6 lite": 1640e9, "v6e": 1640e9,
        "v3": 900e9, "v2": 700e9,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819e9


def main() -> None:
    sys.path.insert(0, ".")
    import pg_strom_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from pg_strom_tpu import T
    from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
    from pg_strom_tpu.expr.lower_jax import ColMeta
    from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, build_preagg_fn

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # 64M-row chunks: the ~3.8ms fixed dispatch floor (BASELINE.md truth #0)
    # makes kernels invisible below ~30M rows/launch; 2^26 matches the
    # executor's large-chunk config on HBM-sized tables
    N = 1 << 26 if on_tpu else 1 << 18

    # flagship: SELECT key, sum(x), count(x), sum(y) FROM t WHERE x > 0.25
    #           GROUP BY key     (int32 key, f32 x, i64 y)
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
    # mxu_dense = the engine's default grouped strategy for single int-lane
    # keys (ops/preagg_mxu.py): every additive partial via ONE batched
    # one-hot matmul on the MXU, with buckets = key - min(key) so the bucket
    # index IS the key (no key-recovery columns, no collisions).
    # G=32: the executor's cross-query memo (exec/preagg_exec._GROUP_STATS)
    # right-sizes repeated dense GROUP BYs to pow2(range+2) buckets — 32 is
    # the engine's honest steady state for this 30-group key, and small G
    # is where the fused kernel's block packing (P = 128/max(G, ncols),
    # ops/preagg_fused._pick_pack) multiplies MXU throughput.
    fn = jax.jit(build_preagg_fn(schema, [key], insts, pred, G=32,
                                 strategy="mxu_dense"))

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

    # warmup/compile — and, crucially, FETCH a result before timing anything.
    # The tunneled TPU runtime defers compilation AND execution until the
    # first device->host read; before that, dispatch and block_until_ready
    # return immediately (measured: a 6s compile "blocked" in 0.00s, kernels
    # appeared 22,000x faster than their true cost).  One fetch switches the
    # runtime into synchronous mode where timings are real.
    t0 = time.perf_counter()
    out = fn(cols, nrows, np.uint64(0))
    err = int(jax.device_get(out["err"]))
    print(f"# compile+first+fetch: {time.perf_counter()-t0:.1f}s err={err}",
          file=sys.stderr)

    # steady-state throughput: dispatch a window of chunks, block once —
    # the executor pipelines chunks exactly this way (min/max_async_chunks),
    # so per-launch tunnel sync overhead (~20ms) overlaps across chunks.
    # min over rounds rides out tunnel/pool contention noise.
    window = 8 if on_tpu else 2
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(cols, nrows, np.uint64(0)) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    dt = best
    rows_per_s = N / dt

    # speed-of-light: bytes touched per row (planes actually read)
    bytes_per_row = 4 + 1 + 4 + 1 + 8 + 1   # key,x,y data + 3 validity
    hbm_gbps = _device_hbm_gbps(dev) if on_tpu else 50e9
    sol_rows = hbm_gbps / bytes_per_row
    vs = rows_per_s / sol_rows
    print(f"# sol assumption: {hbm_gbps/1e9:.0f} GB/s HBM for "
          f"device_kind={getattr(dev, 'device_kind', '?')!r}, "
          f"{bytes_per_row} B/row", file=sys.stderr)

    print(f"# device={dev} N={N} dt={dt*1e3:.2f}ms", file=sys.stderr)
    print(json.dumps({
        "metric": "preagg_filter_group_rows_per_s_per_chip",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
