"""Probe: fused preagg kernel v2 — raw-plane inputs, in-kernel encode.

Round-2 truth #9: the fused kernel is VPU-bound on V-build, and the XLA
encode pass (masked/biased lanes written to HBM) is a whole extra pass of
HBM traffic.  v2 candidates measured here, flagship shape (N=2^26, G=32,
SELECT key, sum(x f32), count(x), sum(y i64) WHERE x > .25 GROUP BY key):

  v1       : current fused_mxu_reduce end-to-end (baseline)
  v2       : raw planes (key i32, x f32 + valid, y i64 + valid) read by the
             kernel; mask/seg/digits/limbs derived in-kernel; y limbs
             range-compressed (stats: y in [0, 2^40) -> 5 limbs, no shadow)
  v2u32    : same but y pre-split into u32 lo/hi planes (if Mosaic i64 is
             slow/broken)
  v2i8     : v2 with int8 one-hot + int8 V (7-bit limbs) + i32 accumulator

Run each mode in a FRESH process (poisoned-compile hazard):
  python tools/probe_v2.py v1|v2|v2u32|v2i8
"""

from __future__ import annotations

import sys
import time
import functools

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401  (x64 + cache init)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 26
G = 32
TILE = 32768
P = 8
T4 = TILE // P
LANES = 128
FLUSH_EVERY = 2          # steps; 2*32768 = 65536 rows per f32 flush window


def rep(x, k):
    return x if k == 1 else jnp.concatenate([x] * k, axis=0)


def limb_iota(dtype, k, mod=None):
    it = jax.lax.broadcasted_iota(dtype, (k * P, T4), 0) // dtype(P)
    return it if mod is None else it % dtype(mod)


def make_v2(y_mode: str, i8: bool):
    """v2 kernel: inputs = raw planes; derive everything in VMEM.

    Physical columns (K):
      0     mask                      (pred & validity)
      1..9  f4s digits of x           (9 signed digit rows)
      10    fabs shadow of x
      11    count(x) ok
      12..16 y-min limbs (5 x 8-bit; range-compressed, stats-proven safe)
    """
    K = 17
    NLIMB_Y = 5
    SK = -(-K * P // LANES)
    SKL = SK * LANES
    GP = G * P
    nsteps = N // TILE
    vdt = jnp.int8 if i8 else jnp.bfloat16

    def kernel(*refs):
        if y_mode == "i64":
            key_ref, x_ref, xv_ref, y_ref, yv_ref, sc_ref = refs[:6]
            acc_refs = refs[6:]
        else:
            key_ref, x_ref, xv_ref, ylo_ref, yhi_ref, yv_ref, sc_ref = refs[:7]
            acc_refs = refs[7:]
        if i8:
            hi_ref, out_sh_ref, acc, accf, sh_acc = acc_refs
        else:
            hi_ref, lo_ref, out_sh_ref, acc, hi_acc, lo_acc, sh_acc = acc_refs
        step = pl.program_id(0)

        @pl.when(step == jnp.int32(0))
        def _():
            for r in acc_refs[len(acc_refs) - (3 if i8 else 4):]:
                r[:] = jnp.zeros_like(r)

        key = key_ref[:]
        x = x_ref[:]
        xv = xv_ref[:]
        yv = yv_ref[:]
        # pred + mask + seg in-kernel (was the XLA encode pass)
        pred = xv & (x > jnp.float32(0.25))
        mask = pred
        seg = jnp.where(mask, key, jnp.int32(G))

        rows: list = []
        rows.append(mask.astype(vdt))                       # mask col
        # --- f4s signed digits of x (9 rows) -------------------------------
        sc = sc_ref[0, 0]
        zero = jnp.float32(0.0)
        xm = jnp.where(mask & xv, x, zero)
        pos = jnp.where(xm > zero, xm, zero)
        neg = jnp.where(xm < zero, -xm, zero)
        sgn = jnp.where(xm < zero, jnp.float32(-1.0), jnp.float32(1.0))
        v = (pos + neg) * sc
        p24 = jnp.float32(1 << 24)
        ints = []
        for _ in range(3):
            w = v * p24
            i_ = jnp.floor(w)
            v = w - i_
            ints.append(i_.astype(jnp.int32))
        rows9 = jnp.concatenate([rep(t, 3) for t in reversed(ints)], axis=0)
        if i8:
            # 7-bit digits won't fit 3x into 24-bit windows; use 8-bit
            # digits still (<=255) but int8 V needs <=127: split each 8-bit
            # digit d = d>>1 + (d - (d>>1)) across... simpler: base-128
            # digits, 4 per 24-bit window is wrong; for the probe use
            # magnitude clamp: d in [0,255] -> two i8 rows would double
            # rows.  Probe cheat: drop to 8 digit rows of 7 bits from two
            # 28-bit windows is complex — just reuse 9 rows with values
            # <=255 truncated to fit i8 by halving (POWER-ONLY probe; NOT
            # exact).  Measures build+dot cost shape, not exactness.
            sh = limb_iota(jnp.int32, 9, mod=3) * jnp.int32(8)
            digits = ((rows9 >> sh) & jnp.int32(0xFF)) >> jnp.int32(1)
            rows.append((digits * rep(sgn, 9).astype(jnp.int32))
                        .astype(jnp.int8))
        else:
            sh = limb_iota(jnp.int32, 9, mod=3) * jnp.int32(8)
            digits = (rows9 >> sh) & jnp.int32(0xFF)
            rows.append((digits.astype(jnp.float32) * rep(sgn, 9))
                        .astype(jnp.bfloat16))
        # --- shadow fabs(x) -------------------------------------------------
        if not i8:
            rows.append(jnp.abs(xm).astype(jnp.bfloat16))
        else:
            rows.append(jnp.zeros_like(xm, dtype=jnp.int8))   # placeholder
        # --- count(x) ok ----------------------------------------------------
        rows.append((xv & mask).astype(vdt))
        # --- y limbs (5 rows, range-compressed; ymin = 0 in this probe) ----
        oky = yv & mask
        if y_mode == "i64":
            y = jnp.where(oky, y_ref[:], jnp.int64(0))
            yl = rep(y, NLIMB_Y)
            sh64 = limb_iota(jnp.int64, NLIMB_Y) * jnp.int64(8)
            limbs = ((yl >> sh64) & jnp.int64(0xFF)).astype(jnp.int32)
        else:
            ylo = jnp.where(oky, ylo_ref[:], jnp.uint32(0))
            yhi = jnp.where(oky, yhi_ref[:], jnp.uint32(0))
            l4 = rep(ylo, 4)
            sh32 = limb_iota(jnp.uint32, 4) * jnp.uint32(8)
            lo_limbs = ((l4 >> sh32) & jnp.uint32(0xFF)).astype(jnp.int32)
            hi_limb = (yhi & jnp.uint32(0xFF)).astype(jnp.int32)
            limbs = jnp.concatenate([lo_limbs, hi_limb], axis=0)
        if i8:
            rows.append((limbs >> jnp.int32(1)).astype(jnp.int8))  # probe-only
        else:
            rows.append(limbs.astype(jnp.bfloat16))

        if K * P < SKL:
            rows.append(jnp.zeros((SKL - K * P, T4), vdt))
        Vt = jnp.concatenate(rows, axis=0)

        # one-hot via i32 compare (bf16/int8 iota are not legal tpu.iota
        # result types), cast to the dot dtype
        oht = (rep(seg, G) == limb_iota(jnp.int32, G)).astype(vdt)

        for sg in range(-(-GP // LANES)):
            g0 = sg * LANES
            h = min(LANES, GP - g0)
            oh_sg = oht[g0:g0 + h]
            for sk in range(SK):
                k0 = sk * LANES
                if i8:
                    acc[g0:g0 + h, k0:k0 + LANES] += jax.lax.dot_general(
                        oh_sg, Vt[k0:k0 + LANES], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    acc[g0:g0 + h, k0:k0 + LANES] += jax.lax.dot_general(
                        oh_sg, Vt[k0:k0 + LANES], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)

        if i8:
            # i32 accumulation is exact; no flush ladder needed below 2^31
            @pl.when(step == jnp.int32(nsteps - 1))
            def _():
                hi_ref[:] = acc[:]
                out_sh_ref[:] = sh_acc[:]
        else:
            @pl.when((step % jnp.int32(FLUSH_EVERY)
                      == jnp.int32(FLUSH_EVERY - 1))
                     | (step == jnp.int32(nsteps - 1)))
            def _():
                a = acc[:]
                sh_acc[:] += a
                t = a.astype(jnp.int32)
                lo_acc[:] += t & jnp.int32(0xFFF)
                hi_acc[:] += t >> jnp.int32(12)
                acc[:] = jnp.zeros_like(acc)

            @pl.when(step == jnp.int32(nsteps - 1))
            def _():
                hi_ref[:] = hi_acc[:]
                lo_ref[:] = lo_acc[:]
                out_sh_ref[:] = sh_acc[:]

    lane = lambda: pl.BlockSpec((P, T4), lambda i: (i, i * 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((GP, SKL), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    n_in = 5 if y_mode == "i64" else 6
    if i8:
        outs = (jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                jax.ShapeDtypeStruct((GP, SKL), jnp.float32))
        scratch = [pltpu.VMEM((GP, SKL), jnp.int32),
                   pltpu.VMEM((GP, SKL), jnp.float32),
                   pltpu.VMEM((GP, SKL), jnp.float32)]
        out_specs = (out_spec, out_spec)
    else:
        outs = (jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                jax.ShapeDtypeStruct((GP, SKL), jnp.int32),
                jax.ShapeDtypeStruct((GP, SKL), jnp.float32))
        scratch = [pltpu.VMEM((GP, SKL), jnp.float32),
                   pltpu.VMEM((GP, SKL), jnp.int32),
                   pltpu.VMEM((GP, SKL), jnp.int32),
                   pltpu.VMEM((GP, SKL), jnp.float32)]
        out_specs = (out_spec, out_spec, out_spec)
    return pl.pallas_call(
        kernel, grid=(nsteps,),
        in_specs=[lane() for _ in range(n_in)]
        + [pl.BlockSpec((1, 1), lambda i: (i * 0, i * 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs, out_shape=outs, scratch_shapes=scratch)


def steady(fn, args, label):
    t0 = time.perf_counter()
    out = fn(*args)
    first = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    print(f"# {label} compile+first: {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(8)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / 8)
    print(f"{label}: {best*1e3:.2f} ms  ({N/best/1e9:.2f} Grows/s)")
    return out, best


def main():
    mode = sys.argv[1]
    rng = np.random.default_rng(0)
    key = rng.integers(0, 30, N).astype(np.int32)
    x = rng.random(N).astype(np.float32)
    xv = (rng.random(N) > 0.05)
    y = rng.integers(0, 1 << 40, N).astype(np.int64)
    yv = (rng.random(N) > 0.05)

    if mode == "v1":
        from pg_strom_tpu import T
        from pg_strom_tpu.expr.ir import ColumnRef, Const, resolve_function
        from pg_strom_tpu.expr.lower_jax import ColMeta
        from pg_strom_tpu.ops.preagg import AggInstance, lookup_agg, \
            build_preagg_fn
        schema = [ColMeta("key", T.INT4), ColMeta("x", T.FLOAT4),
                  ColMeta("y", T.INT8)]
        kr = ColumnRef(type=T.INT4, name="key", index=0)
        xr = ColumnRef(type=T.FLOAT4, name="x", index=1)
        yr = ColumnRef(type=T.INT8, name="y", index=2)
        pred = resolve_function(">", (xr, Const(type=T.FLOAT4, value=0.25)))
        insts = []
        for aggname, arg in (("sum", xr), ("count", xr), ("sum", yr)):
            d, fam = lookup_agg(aggname, (arg.type,))
            insts.append(AggInstance(aggname=aggname, family=fam,
                                     slots=d.slots, args=(arg,)))
        fn = jax.jit(build_preagg_fn(schema, [kr], insts, pred, G=32,
                                     strategy="mxu_dense"))
        cols = ((jax.device_put(key), jax.device_put(np.ones(N, np.bool_))),
                (jax.device_put(x), jax.device_put(xv)),
                (jax.device_put(y), jax.device_put(yv)))
        steady(lambda c, n, s: fn(c, n, s), (cols, np.int32(N), np.uint64(0)),
               "v1")
        return

    i8 = mode == "v2i8"
    y_mode = "i64" if mode in ("v2", "v2i8") else "u32"
    sc_host = np.float32(1.0 / 2.0)   # x in [0,1): max|x| < 1 -> window anchor
    sc = jax.device_put(np.asarray([[sc_host]], np.float32))

    def shp(a):
        return jax.device_put(np.ascontiguousarray(a.reshape(-1, T4)))

    if y_mode == "i64":
        args = (shp(key), shp(x), shp(xv), shp(y), shp(yv), sc)
    else:
        ylo = (y & 0xFFFFFFFF).astype(np.uint32)
        yhi = (y >> 32).astype(np.uint32)
        args = (shp(key), shp(x), shp(xv), shp(ylo), shp(yhi), shp(yv), sc)
    fn = jax.jit(make_v2(y_mode, i8))
    out, dt = steady(fn, args, mode)

    if not i8:
        # exactness check on the integer lanes (count + y sums)
        hi, lo, shd = [np.asarray(o) for o in out]
        full = (hi.astype(np.int64) << 12) + lo
        a4 = full.reshape(G, P, -1, P)
        ints = np.sum(np.diagonal(a4, axis1=1, axis2=3), axis=-1)  # (G, K)
        mask = xv & (x > 0.25)
        seg = np.where(mask, key, G)
        ref_cnt = np.bincount(seg[seg < G], minlength=G)
        okx = mask & xv
        ref_cntx = np.bincount(seg[okx & (seg < G)], minlength=G)
        oky = mask & yv
        ysum = np.zeros(G, np.int64)
        np.add.at(ysum, seg[oky], np.where(oky, y, 0)[oky])
        got_cnt = ints[:, 0]
        got_cntx = ints[:, 11]
        got_ysum = sum(ints[:, 12 + l].astype(np.int64) << (8 * l)
                       for l in range(5))
        print("count exact:", bool((got_cnt == ref_cnt).all()),
              "countx exact:", bool((got_cntx == ref_cntx).all()),
              "ysum exact:", bool((got_ysum == ysum).all()))


if __name__ == "__main__":
    main()
