"""MXU table lookup: out[i] = table[idx[i]] without a gather.

Measured ground truth on v5e (BASELINE.md, tools/bench_gather.py +
/tmp gather probes): XLA gathers run at ~123-272 ms per 16M rows per
column REGARDLESS of table size — TPUs have no hardware vector-gather, so
XLA serializes.  Gathers are the entire cost of the dense join probe and
of every build-side column materialization.

This kernel computes the lookup as a bilinear one-hot contraction on the
MXU + VPU, with no dynamic indexing anywhere:

    d        = idx[i]  =  hi * 128 + lo           (hi < H = ceil(D/128))
    digits   : table values split into K 8-bit digits (exact in bf16)
    M_k      : (128, H) matrix with M_k[lo, hi] = digit_k(table[hi*128+lo])
    rows_k   = M_k @ oh_hi                        (128, TILE)   MXU
    digit_k  = sum_sublane(oh_lo * rows_k)        (1, TILE)     VPU
    out      = sum_k digit_k << 8k                int32 lane

Per-row cost is D*K MACs + ~256*K VPU flops: at D=40960, K=2 that is
~7 ms/16M rows at MXU peak vs ~123 ms for the XLA gather.  Exactness:
digits are integers <= 255 (bf16-exact); each one-hot row selects exactly
one of them, so every f32 intermediate is an exact small integer.

Values must fit in K*8 bits (caller picks K from the value range).  The
caller clips idx into [0, D); out-of-range/unmatched semantics ride on a
sentinel value stored in the table itself (e.g. seg = G for "dropped").

Reference parity: replaces the device-side random access of the
direct-address join probe (`ht["dense"][slot]`, kern_hashentry walks
opencl_hashjoin.h:104-165) with systolic-array friendly dense algebra.

x64-cleanliness (this tunnel's Mosaic service, BASELINE.md truth #8):
explicit jnp.int32 scalars, index maps write `i * 0` never a literal 0.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
MAX_D = 1 << 16        # oh_hi VMEM budget: (512, TILE) bf16 = 4MB at 4096
_HPAD = 16             # bf16 sublane tile


def lookup_digits(value_bits: int) -> int:
    """Digits needed for values < 2^value_bits."""
    return max(1, (value_bits + 7) // 8)


def encode_table(table: np.ndarray, D: int, K: int) -> np.ndarray:
    """(K*128, Hp) bf16 digit matrix M; M[k*128+lo, hi] = digit_k(t[d]).

    numpy in / numpy out (host-side, once per query plan); the caller
    device_puts the result.  `table` holds non-negative ints < 2^(8K)."""
    assert table.shape[0] == D and D <= MAX_D
    H = -(-D // LANE)
    Hp = -(-H // _HPAD) * _HPAD
    t = np.zeros(Hp * LANE, dtype=np.uint32)
    t[:D] = np.asarray(table, dtype=np.uint32)
    grid = t.reshape(Hp, LANE).T                       # [lo, hi]
    M = np.empty((K * LANE, Hp), dtype=np.float32)
    for k in range(K):
        M[k * LANE:(k + 1) * LANE, :] = ((grid >> (8 * k)) & 0xFF)
    return M.astype(jnp.bfloat16)


def encode_table_jax(vals: jnp.ndarray, D: int, K: int,
                     pad_value: int = 0) -> jnp.ndarray:
    """In-trace encode_table: vals int32[D] non-negative -> (K*128, Hp) bf16.

    Runs inside the (jitted) hash-table build so the digit matrix lives in
    HBM next to the table it encodes; slots beyond D are filled with
    pad_value (callers pass their sentinel so padded reads stay unmatched).
    """
    assert vals.shape[0] == D and D <= MAX_D
    H = -(-D // LANE)
    Hp = -(-H // _HPAD) * _HPAD
    t = jnp.full(Hp * LANE, jnp.int32(pad_value), jnp.int32)
    t = t.at[:D].set(vals.astype(jnp.int32))
    grid = t.reshape(Hp, LANE).T                       # [lo, hi]
    rows = [((grid >> jnp.int32(8 * k)) & jnp.int32(0xFF)) for k in range(K)]
    # Mosaic lacks u32->bf16; ints route via f32 (BASELINE truth #8)
    return jnp.concatenate(rows, axis=0).astype(jnp.float32).astype(jnp.bfloat16)


def _pick_tile(n: int) -> int:
    t = 4096
    while t > 512 and t > max(n, 1):
        t >>= 1
    return t


@functools.lru_cache(maxsize=128)
def _build_kernel(N: int, Hp: int, K: int, TILE: int, interpret: bool):
    nsteps = N // TILE

    def kernel(idx_ref, m_ref, out_ref):
        idx = idx_ref[:].reshape(1, TILE)              # int32, in [0, Hp*128)
        hi = idx >> jnp.int32(7)
        lo = idx & jnp.int32(127)
        oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (Hp, TILE), 0)
                 == hi).astype(jnp.bfloat16)           # (Hp, TILE)
        oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (LANE, TILE), 0)
                 == lo).astype(jnp.float32)            # (LANE, TILE)
        rows = jax.lax.dot_general(                    # (K*128, TILE) f32
            m_ref[:], oh_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = jnp.zeros((1, TILE), jnp.int32)
        for k in range(K):
            blk = rows[k * LANE:(k + 1) * LANE, :]     # static slice
            digit = jnp.sum(blk * oh_lo, axis=0, keepdims=True)
            out = out + (digit.astype(jnp.int32) << jnp.int32(8 * k))
        out_ref[:] = out.reshape(TILE)

    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * LANE, Hp), lambda i: (i * 0, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
    )


def mxu_lookup(idx: jnp.ndarray, M: jnp.ndarray, D: int, K: int,
               n: int) -> jnp.ndarray:
    """out[i] = table[idx[i]] (int32), table pre-encoded by encode_table.

    idx int32[n], clipped into [0, D) by the caller.  On the CPU backend
    (tests / no-TPU) the same contract is a plain take — gathers are cheap
    there and Mosaic is TPU-only."""
    Hp = M.shape[1]
    if jax.default_backend() == "cpu":
        # exact reference semantics (also what interpret mode computes)
        digits = M.astype(jnp.float32)                 # (K*128, Hp)
        hi = idx >> jnp.int32(7)
        lo = idx & jnp.int32(127)
        out = jnp.zeros(idx.shape, jnp.int32)
        for k in range(K):
            blk = digits[k * LANE:(k + 1) * LANE, :]   # [lo, hi]
            out = out + (blk[lo, hi].astype(jnp.int32) << (8 * k))
        return out
    TILE = _pick_tile(n)
    orig = idx.shape[0]
    pad = (-orig) % TILE
    if pad:
        idx = jnp.pad(idx, (0, pad))
    out = _build_kernel(idx.shape[0], Hp, K, TILE, False)(idx, M)
    return out[:orig] if pad else out
