"""Device window-ranker probe (round-5: the verdict item-2 stretch).

Measures a rank()/row_number() OVER (PARTITION BY p ORDER BY k) kernel
built from the engine's existing device pieces — ops/sort.packed_argsort
over biased key lanes, boundary detection on the sorted packed words,
cummax positional rank, scatter back to row order — against the host
numpy tier's core (np.lexsort + boundaries) at the same shape.

The decision hinges on the TUNNEL: the result is one value PER ROW (no
contraction), so D2H of the rank plane (int32 = 16 MB at 4M rows) rides
the ~64 MB/s link.  Run on the live chip:

    python tools/probe_window_device.py [log2_rows]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    N = 1 << lg
    import pg_strom_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from pg_strom_tpu.ops.sort import packed_argsort, _bias_chunks

    dev = jax.devices()[0]
    print(f"# device={dev} N=2^{lg}", file=sys.stderr)

    rng = np.random.default_rng(0)
    part_np = rng.integers(0, 1000, N).astype(np.int32)
    key_np = rng.integers(0, 100000, N).astype(np.int32)

    def rank_fn(part, key):
        lanes = (_bias_chunks(part.astype(jnp.int64), 32)
                 + _bias_chunks(key.astype(jnp.int64), 32))
        perm = packed_argsort(lanes, N)
        ps = part[perm]
        ks = key[perm]
        idx = jax.lax.broadcasted_iota(jnp.int32, (N,), 0)
        new_part = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                    ps[1:] != ps[:-1]])
        new_peer = new_part | jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
        part_start = jax.lax.cummax(jnp.where(new_part, idx, 0))
        peer_start = jax.lax.cummax(jnp.where(new_peer, idx, 0))
        rank = (peer_start - part_start + 1).astype(jnp.int32)
        return jnp.zeros((N,), jnp.int32).at[perm].set(rank)

    fn = jax.jit(rank_fn)
    t0 = time.perf_counter()
    part_d = jax.device_put(part_np)
    key_d = jax.device_put(key_np)
    print(f"# upload {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    out = fn(part_d, key_d)
    ranks_dev = np.asarray(jax.device_get(out))
    print(f"# compile+first+fetch {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # steady state: kernel-only (window of dispatches, block once) and
    # kernel+fetch (what a query actually pays)
    best_k = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outs = [fn(part_d, key_d) for _ in range(8)]
        jax.block_until_ready(outs)
        best_k = min(best_k, (time.perf_counter() - t0) / 8)
    best_kf = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jax.device_get(fn(part_d, key_d)))
        best_kf = min(best_kf, time.perf_counter() - t0)

    # host tier core at the same shape (the numpy columnar path's work)
    t_host = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        order = np.lexsort((key_np, part_np))
        ps = part_np[order]
        ks = key_np[order]
        new_part = np.empty(N, bool)
        new_part[0] = True
        new_part[1:] = ps[1:] != ps[:-1]
        new_peer = new_part.copy()
        new_peer[1:] |= ks[1:] != ks[:-1]
        idx = np.arange(N, dtype=np.int64)
        part_start = np.maximum.accumulate(np.where(new_part, idx, 0))
        peer_start = np.maximum.accumulate(np.where(new_peer, idx, 0))
        rank = peer_start - part_start + 1
        res = np.empty(N, np.int64)
        res[order] = rank
        t_host = min(t_host, time.perf_counter() - t0)

    assert (ranks_dev == res.astype(np.int32)).all(), "device != host!"
    print(f"lg={lg} device_kernel={best_k*1e3:.1f}ms "
          f"device_kernel+fetch={best_kf*1e3:.0f}ms "
          f"host_core={t_host*1e3:.0f}ms "
          f"speedup_kernel={t_host/best_k:.1f}x "
          f"speedup_with_fetch={t_host/best_kf:.1f}x")


if __name__ == "__main__":
    main()
