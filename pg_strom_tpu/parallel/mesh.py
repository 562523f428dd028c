"""Device mesh construction.

The multi-device scheduling analog (reference round-robin device pick,
opencl_serv.c:100-106) — except on TPU the mesh is declarative: shardings
place data, XLA inserts the collectives.  Axis naming convention:

  dp — data/shuffle parallelism across all chips (the only axis the query
       engine needs: rows are hash-partitioned over it)

A 2D ("hosts", "chips") mesh for hierarchical DCN/ICI shuffles is a planned
refinement; the shuffle layer is written against a named axis so it carries
over unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def get_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"with JAX platform cpu for virtual-device testing)")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
