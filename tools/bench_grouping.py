"""Grouping-strategy shootout on the real TPU (truth-mode timing).

Run: python tools/bench_grouping.py <strategy> [N] [G]
strategies: scatter | sort | mxu | mxu_wide

Each invocation is ONE fresh process (one strategy, ~2 jits) per the TPU
process rules in .claude/skills/verify/SKILL.md.  Timing protocol: fetch a
result before timing anything (the tunneled runtime defers execution until
the first device->host read), then time fetch-to-fetch.

The workload mirrors the flagship preagg: bucket 4M rows by a key into G
groups and compute count + an int64 sum (8 limb cols on MXU) + an f32 sum,
plus the per-bucket key-constancy check each strategy needs for exactness.
"""

import sys
import time

import numpy as np


def main() -> None:
    strategy = sys.argv[1] if len(sys.argv) > 1 else "scatter"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    key = rng.integers(0, G, N).astype(np.int32)   # already bucket ids
    vi = rng.integers(-1000, 1000, N).astype(np.int64)
    vf = rng.random(N).astype(np.float32)

    if strategy == "scatter":
        def fn(bucket, vi, vf):
            cnt = jax.ops.segment_sum(jnp.ones_like(bucket, jnp.int64),
                                      bucket, num_segments=G)
            si = jax.ops.segment_sum(vi, bucket, num_segments=G)
            sf = jax.ops.segment_sum(vf.astype(jnp.float64), bucket,
                                     num_segments=G)
            lo = jax.ops.segment_min(vi, bucket, num_segments=G)
            hi = jax.ops.segment_max(vi, bucket, num_segments=G)
            return cnt, si, sf, (lo != hi).any()
        args = (key, vi, vf)
    elif strategy == "sort":
        from pg_strom_tpu.ops.sort import packed_argsort

        def fn(bucket, vi, vf):
            order = packed_argsort([(bucket.astype(jnp.int64), 32)], N)
            b = bucket[order]
            cnt = jax.ops.segment_sum(jnp.ones_like(b, jnp.int64), b,
                                      num_segments=G)
            si = jax.ops.segment_sum(vi[order], b, num_segments=G)
            sf = jax.ops.segment_sum(vf[order].astype(jnp.float64), b,
                                     num_segments=G)
            return cnt, si, sf
        args = (key, vi, vf)
    elif strategy in ("mxu", "mxu_wide"):
        from pg_strom_tpu.ops.preagg_mxu import mxu_reduce, SEG_ROWS

        nextra = 32 if strategy == "mxu_wide" else 0

        def fn(bucket, vi, vf):
            ones = jnp.ones(N, jnp.float32)
            biased = (vi + jnp.int64(1) << 62).astype(jnp.uint64)
            limbs = [((biased >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                     .astype(jnp.float32) for j in range(8)]
            cols = [ones] + limbs + [vf]
            # key-constancy columns: sum(k), sum(k^2) as 5+8 limb cols
            kb = bucket.astype(jnp.uint64)
            cols += [((kb >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                     .astype(jnp.float32) for j in range(5)]
            k2 = kb * kb
            cols += [((k2 >> jnp.uint64(8 * j)) & jnp.uint64(0xFF))
                     .astype(jnp.float32) for j in range(8)]
            for j in range(nextra):
                cols.append(ones * np.float32(j))
            V = jnp.stack(cols, axis=1)
            sums, fsums = mxu_reduce(V, bucket, G, N)
            return sums, fsums
        args = (key, vi, vf)
    else:
        raise SystemExit(f"unknown strategy {strategy}")

    jfn = jax.jit(fn)
    # device-resident inputs: the engine's tcache keeps tables in HBM, and
    # tunnel H2D is ~80MB/s — with numpy args every strategy degenerates to
    # the same input-upload time and the comparison is meaningless
    args = jax.device_put(args)
    jax.block_until_ready(args)

    t0 = time.perf_counter()
    out = jfn(*args)
    first = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t_compile = time.perf_counter() - t0

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    print(f"{strategy:9s} N={N} G={G} compile+first={t_compile:6.1f}s "
          f"steady={best*1e3:8.2f}ms  {N/best/1e6:10.1f} Mrows/s")


if __name__ == "__main__":
    main()
