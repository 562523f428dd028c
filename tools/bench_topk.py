"""Probe: lax.top_k cost on TPU for the threshold top-k sort design.

Measures top_k over int64 at n=4M/16M with k=128 and k=4096, plus the
gather+small-sort epilogue, vs the current full packed_argsort.
Fresh process; fetch-first truth mode.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(fn, args, tag, rounds=3, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    for nlog in (22, 24):
        n = 1 << nlog
        x = jax.device_put(rng.integers(0, 1 << 62, n, dtype=np.int64))
        for k in (128, 4096):
            f = jax.jit(lambda v, kk=k: jax.lax.top_k(v, kk))
            timeit(f, (x,), f"top_k n=2^{nlog} k={k} i64")
        # i32 comparison
        xi = jax.device_put(rng.integers(0, 1 << 31, n, dtype=np.int64)
                            .astype(np.int32))
        f = jax.jit(lambda v: jax.lax.top_k(v, 128))
        timeit(f, (xi,), f"top_k n=2^{nlog} k=128 i32")
        # full packed sort baseline
        from pg_strom_tpu.ops.sort import packed_argsort
        g = jax.jit(lambda v: packed_argsort([(v, 62)], n))
        timeit(g, (x,), f"packed_argsort n=2^{nlog}")


if __name__ == "__main__":
    main()
