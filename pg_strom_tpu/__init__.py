"""pg_strom_tpu — a TPU-native vectorized SQL query-execution engine.

A from-scratch reimplementation of the capability set of PG-Strom
(reference: /root/reference, a PostgreSQL extension offloading scan /
hash-join / pre-aggregation to OpenCL devices), redesigned for TPU:

  reference mechanism                      TPU-native replacement
  ------------------------------------     -------------------------------------
  OpenCL C runtime codegen (codegen.c)     typed expr IR traced to XLA (expr/)
  program cache (opencl_devprog.c)         jax jit compilation cache
  kern_data_store row layouts              struct-of-arrays columnar chunks
  mqueue + OpenCL server bgworker          async jit dispatch + C++ loader pool
  per-row error writeback + CpuReCheck     uint8 error lanes + host-exact replay
  round-robin multi-device scheduling      jax.sharding.Mesh + shard_map
  (absent: distributed)                    all_to_all shuffle join/agg (parallel/)

PostgreSQL exactness (NULL logic, int overflow errors, numeric semantics,
text collation) is preserved via the same two-tier design the reference uses:
a fast device path plus a host-exact fallback for anything out of window.
"""

from __future__ import annotations

import os

# float8/int8 SQL types need real f64/i64 lanes; must be set before any jax
# array is created.  TPU executes f64 via software emulation — correctness
# first; hot kernels downcast explicitly where SQL semantics allow.
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compiled-program cache (the opencl_devprog.c analog: a shared,
# key-hashed cache so a query shape compiles once per machine, not once per
# process — TPU compiles over the tunnel run 10-60s each).  CPU runs skip it:
# reading back cached multi-device CPU-mesh executables segfaults (observed
# with the 8-device virtual mesh the test suite uses), and CPU compiles are
# cheap anyway.
_cache_dir = os.environ.get(
    "PG_STROM_TPU_PROGRAM_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "pg_strom_tpu", "xla"))
# skip the cache only when cpu is the PRIMARY platform (the test suite's
# JAX_PLATFORMS=cpu) — NOT when it is merely a fallback entry: the real TPU
# tunnel runs as "axon,cpu", and round 2's substring check disabled the
# cache exactly where the 704s flagship compile needed it (BENCH_r02)
_platforms = (jax.config.jax_platforms or "").split(",")
if _cache_dir and _cache_dir != "off" and (_platforms[0] or "tpu") != "cpu":
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimization; never fail import over it
        pass

__version__ = "0.1.0"

from .config import config, set_config, get_config, show_all, override  # noqa: F401,E402
from .sqltypes import T  # noqa: F401,E402
from .datastore import Table, Column, Chunk, Database, column_from_values, column_from_numpy  # noqa: F401,E402
from .errors import SqlError, CpuReCheck  # noqa: F401,E402
