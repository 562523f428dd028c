"""Measure gather/scatter primitive costs on the TPU (truth mode).

python tools/bench_gather.py <case>
cases: gather_small | gather_big | scatter_set | cumsum | probe_like
"""
import sys
import time

import numpy as np


def main():
    case = sys.argv[1]
    N = 1 << 24
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx_small = jax.device_put(rng.integers(0, 1 << 16, N).astype(np.int32))
    idx_big = jax.device_put(rng.integers(0, N, N).astype(np.int32))
    small = jax.device_put(rng.random(1 << 16).astype(np.float32))
    big = jax.device_put(rng.random(N).astype(np.float32))
    vals = jax.device_put(rng.random(N).astype(np.float32))

    if case == "gather_small":
        fn = jax.jit(lambda t, i: jnp.sum(t[i]))
        args = (small, idx_small)
    elif case == "gather_big":
        fn = jax.jit(lambda t, i: jnp.sum(t[i]))
        args = (big, idx_big)
    elif case == "scatter_set":
        fn = jax.jit(lambda v, i: jnp.zeros(N, jnp.float32).at[i].set(v,
                     mode="drop")[::4096].sum())
        args = (vals, idx_big)
    elif case == "cumsum":
        fn = jax.jit(lambda v: jnp.cumsum(v.astype(jnp.int32))[-1])
        args = (vals,)
    elif case == "probe_like":
        # 4x small-table gather + compare + sum (phase-1 shape)
        def f(t, i):
            c = jnp.zeros(N, jnp.int32)
            for k in range(4):
                c = c + (t[jnp.clip(i + k, 0, (1 << 16) - 1)] > 0.5)
            return jnp.sum(c)
        fn = jax.jit(f)
        args = (small, idx_small)
    else:
        raise SystemExit(case)

    out = fn(*args)
    _ = jax.device_get(out)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{case:12s} {best*1e3:9.2f} ms  {N/best/1e6:9.1f} Mrows/s")


if __name__ == "__main__":
    main()
