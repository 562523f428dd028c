"""MXU table lookup: exactness of the digit-matrix encoding and the
CPU-contract path, plus the Pallas kernel in interpret mode.

The kernel replaces XLA gathers (no hardware vector-gather on TPU) with a
one-hot MXU contraction; reference parity: the direct-address join probe's
random access (opencl_hashjoin.h:104-165 hash-entry walks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pg_strom_tpu.ops.mxu_lookup import (
    LANE, encode_table, lookup_digits, mxu_lookup, _build_kernel, _pick_tile)


@pytest.mark.parametrize("D,bits", [(100, 8), (2048, 12), (40960, 12),
                                    (65536, 16), (5000, 32)])
def test_cpu_path_exact(rng, D, bits):
    K = lookup_digits(bits)
    hi = min(1 << bits, 1 << 31)
    tab = rng.integers(0, hi, D).astype(np.uint32)
    idx = rng.integers(0, D, 10_000).astype(np.int32)
    M = jnp.asarray(encode_table(tab, D, K))
    out = np.asarray(mxu_lookup(jnp.asarray(idx), M, D, K, idx.shape[0]))
    np.testing.assert_array_equal(out, tab[idx].astype(np.int32))


def test_digits():
    assert lookup_digits(1) == 1
    assert lookup_digits(8) == 1
    assert lookup_digits(9) == 2
    assert lookup_digits(16) == 2
    assert lookup_digits(32) == 4


def test_encode_table_layout(rng):
    D, K = 300, 2
    tab = rng.integers(0, 1 << 16, D).astype(np.uint32)
    M = np.asarray(encode_table(tab, D, K)).astype(np.uint32)
    # M[k*128+lo, hi] holds digit k of table[hi*128+lo]
    for d in (0, 1, 127, 128, 299):
        hi, lo = divmod(d, LANE)
        v = sum(int(M[k * LANE + lo, hi]) << (8 * k) for k in range(K))
        assert v == int(tab[d]), d


def test_pallas_interpret_exact(rng):
    D, bits = 2048, 12
    K = lookup_digits(bits)
    tab = rng.integers(0, 1 << bits, D).astype(np.uint32)
    N = 1024
    idx = rng.integers(0, D, N).astype(np.int32)
    M = jnp.asarray(encode_table(tab, D, K))
    Hp = M.shape[1]
    TILE = _pick_tile(N)
    pad = (-N) % TILE
    idx_p = jnp.pad(jnp.asarray(idx), (0, pad))
    out = _build_kernel(int(idx_p.shape[0]), Hp, K, TILE, True)(idx_p, M)
    np.testing.assert_array_equal(np.asarray(out)[:N],
                                  tab[idx].astype(np.int32))
