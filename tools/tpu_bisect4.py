"""Round 4: methodology check — does cycling distinct input buffers change
timings? (Suspicion: repeated identical calls hit a result cache in the
tunnel, making scatter look 500x faster than it is.)"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
on_tpu = dev.platform != "cpu"
N = 1 << 22 if on_tpu else 1 << 18
G = 256

rng = np.random.default_rng(0)
xs = [jax.device_put(rng.random(N).astype(np.float32)) for _ in range(3)]
segs = [jax.device_put(rng.integers(0, G, N).astype(np.int32)) for _ in range(3)]


def bench(name, call, nbuf):
    out = call(0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for i in range(6):
            out = call(i % nbuf)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 6)
    print(f"{name:46s} steady={best*1e3:9.3f}ms {N/best/1e9:7.2f} Grows/s",
          flush=True)


fadd = jax.jit(lambda x: x + 1.0)
bench("elementwise x+1, same buffer", lambda i: fadd(xs[0]), 1)
bench("elementwise x+1, cycle 3 buffers", lambda i: fadd(xs[i]), 3)

fsum = jax.jit(lambda x: jnp.sum(x))
bench("reduce sum(x), same buffer", lambda i: fsum(xs[0]), 1)
bench("reduce sum(x), cycle 3 buffers", lambda i: fsum(xs[i]), 3)

fsc = jax.jit(lambda s, x: jax.ops.segment_sum(x, s, num_segments=G))
bench("param scatter, same buffers", lambda i: fsc(segs[0], xs[0]), 1)
bench("param scatter, cycle 3 buffers", lambda i: fsc(segs[i], xs[i]), 3)

B = 1 << 13
NB = N // B
gar = jnp.arange(G, dtype=jnp.int32)
def mm(s, x):
    def step(acc, inp):
        sb, vb = inp
        oh = (sb[:, None] == gar[None, :]).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            oh, vb[:, None].astype(jnp.float32), (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)[:, 0], None
    acc, _ = jax.lax.scan(step, jnp.zeros((G,), jnp.float32),
                          (s.reshape(NB, B), x.reshape(NB, B)))
    return acc
fmm = jax.jit(mm)
bench("matmul segsum B=8k, same buffers", lambda i: fmm(segs[0], xs[0]), 1)
bench("matmul segsum B=8k, cycle 3", lambda i: fmm(segs[i], xs[i]), 3)

fst = jax.jit(lambda x: jax.lax.sort(x))
bench("lax.sort f32, same buffer", lambda i: fst(xs[0]), 1)
bench("lax.sort f32, cycle 3 buffers", lambda i: fst(xs[i]), 3)
