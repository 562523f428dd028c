#!/bin/bash
# Each case runs in its OWN python process (state poisoning is per-process).
# Usage: tpu_iso_test.sh <case>
case="$1"
python - "$case" <<'EOF' 2>/dev/null
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

case = sys.argv[1]
N = 1 << 22
G = 256
rng = np.random.default_rng(0)
keys = [jax.device_put(rng.integers(0, 30, N).astype(np.int32)) for _ in range(3)]
xs = [jax.device_put(rng.random(N).astype(np.float32)) for _ in range(3)]
vks = [jax.device_put(np.ones(N, dtype=np.bool_)) for _ in range(3)]

# module-level device scalar (the suspect) vs python literal
DEV_TAG = jnp.uint32(0x9E3779B9)

def mix(x):
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)

def seg_devconst(k, vk):
    h = mix(k.astype(jnp.uint32))
    h = jnp.where(vk, h, DEV_TAG)              # captured device array
    return (h & jnp.uint32(G - 1)).astype(jnp.int32)

def seg_literal(k, vk):
    h = mix(k.astype(jnp.uint32))
    h = jnp.where(vk, h, jnp.uint32(0x9E3779B9))   # traced literal
    return (h & jnp.uint32(G - 1)).astype(jnp.int32)

def seg_library(k, vk):
    from pg_strom_tpu import T
    from pg_strom_tpu.ops.hashing import hash_column32, combine_hashes32
    h = combine_hashes32([hash_column32(T.INT4, k, vk)])
    return (h & jnp.uint32(G - 1)).astype(jnp.int32)

fns = {"devconst": seg_devconst, "literal": seg_literal, "library": seg_library}
base = fns[case.split(":")[0]]
with_scatter = ":scatter" in case
if with_scatter:
    f = jax.jit(lambda k, vk, x: jax.ops.segment_sum(base(k, vk), x * 0 + 1.0,
                num_segments=G) if False else
                jax.ops.segment_sum(x, base(k, vk), num_segments=G))
    call = lambda i: f(keys[i], vks[i], xs[i])
else:
    f = jax.jit(base)
    call = lambda i: f(keys[i], vks[i])

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

# probe: is the process degraded now?
ftiny = jax.jit(lambda: jnp.zeros((), jnp.float32) + 1.0)
jax.block_until_ready(ftiny())
t0 = time.perf_counter()
for _ in range(10):
    o = ftiny()
jax.block_until_ready(o)
tiny = (time.perf_counter() - t0) / 10
print(f"{case:24s} compile={tc:7.1f}s steady={best*1e3:9.3f}ms "
      f"tiny-after={tiny*1e3:7.3f}ms", flush=True)
EOF
