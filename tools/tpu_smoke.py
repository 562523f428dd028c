"""Real-TPU engine smoke: the flagship-shaped query through the FULL SQL
engine (v2 raw-plane kernel) on the live chip, diffed against the host
tier under the engine's PG text contract (extra_float_digits=-3 — the
reference regression corpus's own float tolerance; integer/Decimal outputs
must be bit-identical).

Round-3 record: 24/24 rows identical on TPU v5e.  Run: python tools/tpu_smoke.py
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import pg_strom_tpu  # noqa: F401
from pg_strom_tpu import T, Table, Database, override
from pg_strom_tpu.datastore import column_from_numpy
from pg_strom_tpu.sql.api import execute


def main() -> None:
    import jax
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(42)
    n = 1 << 22
    db = Database()
    db.create(Table.from_columns("t", {
        "k": column_from_numpy(T.INT4,
                               rng.integers(0, 24, n).astype(np.int32)),
        "x": column_from_numpy(T.FLOAT4,
                               (rng.random(n) * 100 - 30).astype(np.float32),
                               rng.random(n) > 0.07),
        "y": column_from_numpy(T.INT8,
                               rng.integers(-(1 << 44), 1 << 44,
                                            n).astype(np.int64),
                               rng.random(n) > 0.04),
    }))
    execute("set extra_float_digits to -3", db)
    q = ("SELECT k, count(*), count(x), sum(y), sum(x), avg(y), min(y), "
         "max(x) FROM t WHERE x > 5.5 GROUP BY k ORDER BY k")
    with override(debug_force_offload=True):
        dev = execute(q, db).formatted()
    with override(enabled=False):
        host = execute(q, db).formatted()
    diff = [i for i, (d, h) in enumerate(zip(dev, host)) if d != h]
    assert not diff and len(dev) == len(host), (diff, dev[:2], host[:2])
    print(f"TPU engine parity OK: {len(dev)} rows identical under the "
          "PG text contract")


if __name__ == "__main__":
    main()
