"""Plan-shape parity vs the reference explain_agg golden (SURVEY.md §4).

Covers the last regression pillar: expected/explain_agg.out — all 612
EXPLAIN statements, replayed with the golden's own pg_strom GUC script.
Asserts per statement (see tools/explain_parity.py):
  - offload decision parity (TpuPreAgg iff Custom (GpuPreAgg); nothing
    offloaded while pg_strom.enabled=off)
  - Sort plan-shape parity
  - partial-aggregate rewrite parity (pgstrom.nrows/psum/psum_x2/pmax/pmin/
    pcov_* of gpupreagg.c:104-333 map onto our AGG_CATALOG slots)
Offloading MORE than the golden (int2/int4 stddev family, which the
reference's device catalog lacks) is a tracked superset, not a failure.

The remaining suite, expected/agg_init.out, is the fixture-creation script;
its analog is models/pg_fixture.py regenerating the table bit-exactly from
PostgreSQL's PRNG — proven by the value suites (test_pg_parity.py).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_explain_agg_plan_shape_parity():
    from explain_parity import run_explain_parity

    total = run_explain_parity(max_diffs=20)
    assert total["explains"] == 612
    assert total["diff"] == 0, f"plan-shape diffs: {total}"
    assert total["error"] == 0, f"engine errors: {total}"
    # every query the reference offloads, we offload (and then some)
    assert total["match"] == 612
