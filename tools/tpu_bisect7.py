"""Round 7: state-poisoning test. Time a known-good scatter BEFORE and AFTER
compiling/running the known-bad program in the same process."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from pg_strom_tpu import T
from pg_strom_tpu.ops.hashing import hash_column32, combine_hashes32

N = 1 << 22
G = 256
rng = np.random.default_rng(0)
keys = [jax.device_put(rng.integers(0, 30, N).astype(np.int32)) for _ in range(3)]
xs = [jax.device_put(rng.random(N).astype(np.float32)) for _ in range(3)]
vks = [jax.device_put(np.ones(N, dtype=np.bool_)) for _ in range(3)]
segs = [jax.device_put(rng.integers(0, G, N).astype(np.int32)) for _ in range(3)]


def bench(name, call):
    t0 = time.perf_counter()
    jax.block_until_ready(call(0))
    tc = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for i in range(6):
            out = call(i % 3)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 6)
    print(f"{name:52s} compile={tc:6.1f}s steady={best*1e3:9.3f}ms",
          flush=True)


fsc = jax.jit(lambda s, x: jax.ops.segment_sum(x, s, num_segments=G))
ftiny = jax.jit(lambda: jnp.zeros((), jnp.float32) + 1.0)
fel = jax.jit(lambda x: x + 1.0)

bench("1 param scatter BEFORE", lambda i: fsc(segs[i], xs[i]))
bench("2 tiny program BEFORE", lambda i: ftiny())
bench("3 elementwise BEFORE", lambda i: fel(xs[i]))

# hash chain ALONE (no scatter) — is it itself poisonous?
def hh(k, vk):
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    return (h & jnp.uint32(G - 1)).astype(jnp.int32)
fh = jax.jit(hh)
bench("4 hash chain alone", lambda i: fh(keys[i], vks[i]))

bench("5 param scatter AFTER hash-alone", lambda i: fsc(segs[i], xs[i]))
bench("6 tiny AFTER hash-alone", lambda i: ftiny())

# the known-bad program: hash fused with scatter in one jit
fbad = jax.jit(lambda k, vk, x: jax.ops.segment_sum(
    x, hh(k, vk), num_segments=G))
bench("7 BAD hash+scatter one jit", lambda i: fbad(keys[i], vks[i], xs[i]))

bench("8 param scatter AFTER bad", lambda i: fsc(segs[i], xs[i]))
bench("9 tiny AFTER bad", lambda i: ftiny())
bench("10 elementwise AFTER bad", lambda i: fel(xs[i]))
bench("11 hash alone AFTER bad", lambda i: fh(keys[i], vks[i]))
