#!/bin/bash
# lax.sort compile/steady vs operand count and dtype; fresh process per case.
for case in "$@"; do
python - "$case" <<'EOF' 2>/dev/null
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

case = sys.argv[1]
N = 1 << 22
rng = np.random.default_rng(0)
i32 = [jax.device_put(rng.integers(-10000, 10000, N).astype(np.int32)) for _ in range(3)]
i64a = [jax.device_put(rng.integers(-(1<<40), 1<<40, N).astype(np.int64)) for _ in range(3)]
i64b = [jax.device_put(rng.integers(-(1<<40), 1<<40, N).astype(np.int64)) for _ in range(3)]
idx = jnp.arange(N, dtype=jnp.int32)

if case == "i32key":
    f = jax.jit(lambda k: jax.lax.sort((k, idx), num_keys=1, is_stable=True)[1])
    call = lambda i: f(i32[i])
elif case == "i64key":
    f = jax.jit(lambda k: jax.lax.sort((k, idx), num_keys=1, is_stable=True)[1])
    call = lambda i: f(i64a[i])
elif case == "2i64key":
    f = jax.jit(lambda a, b: jax.lax.sort((a, b, idx), num_keys=2,
                                          is_stable=True)[2])
    call = lambda i: f(i64a[i], i64b[i])
elif case == "3i64key":
    f = jax.jit(lambda a, b: jax.lax.sort((a, b, a ^ b, idx), num_keys=3,
                                          is_stable=True)[3])
    call = lambda i: f(i64a[i], i64b[i])
elif case == "6i64key":
    f = jax.jit(lambda a, b: jax.lax.sort(
        (a, b, a ^ b, a + b, a - b, jnp.abs(a), idx), num_keys=6,
        is_stable=True)[6])
    call = lambda i: f(i64a[i], i64b[i])
elif case == "2i32key":
    f = jax.jit(lambda a, b: jax.lax.sort(
        (a, (b & jnp.int64(0xFFFFFFFF)).astype(jnp.int32), idx), num_keys=2,
        is_stable=True)[2])
    call = lambda i: f(i32[i], i64b[i])

t0 = time.perf_counter()
jax.block_until_ready(call(0))
tc = time.perf_counter() - t0
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    for i in range(4):
        out = call(i % 3)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / 4)
print(f"{case:10s} compile={tc:7.1f}s steady={best*1e3:9.3f}ms "
      f"{N/best/1e9:6.3f} Grows/s", flush=True)
EOF
done
