"""MXU lookup kernel vs XLA gather: exactness + throughput on the chip.

Usage: python tools/bench_lookup.py [N_log2]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from pg_strom_tpu.ops.mxu_lookup import (encode_table, lookup_digits,
                                         mxu_lookup)


def timeit(fn, args, tag, window=8):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(window)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / window)
    print(f"{tag}: {best*1e3:.2f} ms")
    return best


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    N = 1 << nlog
    rng = np.random.default_rng(0)

    for D, bits in ((2048, 12), (40960, 12), (65536, 32)):
        K = lookup_digits(bits)
        tab = rng.integers(0, 1 << bits, D).astype(np.uint32)
        idx = rng.integers(0, D, N).astype(np.int32)
        M = jax.device_put(jnp.asarray(encode_table(tab, D, K)))
        idx_d = jax.device_put(idx)
        tab_d = jax.device_put(tab.astype(np.int32))

        f = jax.jit(lambda i, m: mxu_lookup(i, m, D, K, N))
        out = jax.device_get(f(idx_d, M))
        want = tab[idx].astype(np.int32)
        ok = np.array_equal(out, want)
        print(f"D={D} K={K}: exact={'OK' if ok else 'MISMATCH'}")
        if not ok:
            bad = np.flatnonzero(out != want)[:5]
            print("  first bad:", [(int(i), int(out[i]), int(want[i]))
                                   for i in bad])
            continue
        timeit(f, (idx_d, M), f"mxu_lookup D={D} K={K}")
        g = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.int64)))
        timeit(g, (tab_d, idx_d), f"xla-gather D={D}")


if __name__ == "__main__":
    main()
