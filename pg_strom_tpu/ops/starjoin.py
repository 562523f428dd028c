"""N-way fused star join -> grouped partial aggregation in one program.

The multi-relation device join chain (reference: gpuhashjoin merges
consecutive joins into one multi-rel kernel — path merge gpuhashjoin.c:789-835,
probe recursion opencl_hashjoin.h kern_gpuhashjoin_main depths /
gpuhashjoin.c:1184-1318 — and passes device-resident bulkslots between GPU
nodes, pg_strom.h:317-329).  TPU-native form: each dimension is a
direct-address (dense) build table probed with ONE lookup per dim — no
chain recursion, no pair materialization; the joined row set stays
ROW-ALIGNED with the fact chunk (match mask = AND over dims), and the
grouped partial aggregation runs over the same program's lanes.  Star
queries with any number of dimensions make a single device round trip per
fact chunk, never materializing an intermediate host Table.

Applicability: every dimension build side must be unique on a single
int-lane key (ht['dense_ok'] — the dimension-table shape); non-unique or
multi-key dims fall back to the pairwise HashJoin chain (exec/join_exec.py)
which handles arbitrary fan-out.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from ..sqltypes import T
from ..expr.ir import Expr, ColumnRef
from ..expr.lower_jax import ColMeta
from .hashjoin import build_probe_dense_fn
from .preagg import AggInstance, build_preagg_fn


def build_star_join_preagg_fn(pschema: Sequence[ColMeta],
                              dim_specs: Sequence[dict],
                              probe_pred: Optional[Expr],
                              jschema: Sequence[ColMeta],
                              probe_slots: Sequence[int],
                              build_slot_map: dict,
                              group_exprs: Sequence[Expr],
                              aggs: Sequence[AggInstance],
                              G: int, strategy: str = "scatter") -> Callable:
    """f(hts tuple, pcols, bcols_list tuple, nrows, salt) -> preagg pytree.

    dim_specs[i]: {"probe_keys": [Expr], "dense_cap": int, "use_mxu": bool,
    "row_bits": int} — one dense probe per dimension.  jschema slots fill
    from the probe chunk (probe_slots[j] >= 0) or from dimension d's column
    b (build_slot_map[j] = (d, b)) gathered at that dim's matched row.
    The AND of all dim match masks rides as a synthetic bool filter lane."""
    probe_slots = list(probe_slots)
    dprobe_fns = [
        build_probe_dense_fn(pschema, list(d["probe_keys"]), d["dense_cap"],
                             probe_pred if i == 0 else None,
                             use_mxu=d["use_mxu"], row_bits=d["row_bits"])
        for i, d in enumerate(dim_specs)]
    jschema_eff = list(jschema) + [ColMeta("__match__", T.BOOL)]
    match_pred = ColumnRef(type=T.BOOL, name="__match__", index=len(jschema))
    pre_fn = build_preagg_fn(jschema_eff, list(group_exprs), list(aggs),
                             match_pred, G, strategy)

    def f(hts: tuple, pcols: tuple, bcols_list: tuple, nrows, salt):
        matched = None
        brs = []
        jerr = jnp.uint8(0)
        for dfn, ht in zip(dprobe_fns, hts):
            m, br, _, e = dfn(ht, pcols, nrows)
            matched = m if matched is None else (matched & m)
            brs.append(br)
            jerr = jnp.maximum(jerr, e)
        jcols = []
        for jslot in range(len(jschema)):
            if probe_slots[jslot] >= 0:
                g = list(pcols[probe_slots[jslot]])
            else:
                di, bci = build_slot_map[jslot]
                g = [p[brs[di]] for p in bcols_list[di][bci]]
            g[1] = g[1] & matched
            jcols.append(tuple(g))
        jcols.append((matched, jnp.ones_like(matched)))   # __match__ lane
        out = pre_fn(tuple(jcols), nrows, salt)
        out["err"] = jnp.maximum(out["err"], jerr)
        out["nout"] = jnp.int32(0)        # row-aligned: no output capacity
        return out

    return f
