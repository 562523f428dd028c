"""Golden parity: the reference's own regression suite, character-exact.

Runs the reference's SQL corpora over the bit-exactly regenerated PostgreSQL
fixture and diffs text output against /root/reference/expected/*.out —
the strongest form of the reference's pg_regress differential contract
(SURVEY §4; BASELINE "exact-match results on the agg/join regression suite").

The full six-suite run costs a few minutes (fixture regeneration + the
3-way-join mix view), so the quick suites run in CI and the mix-dependent
one is marked slow-ish but still on by default — exactness is the product.
"""

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{REF}/expected"), reason="reference goldens not mounted")


@pytest.fixture(scope="module")
def harness():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import pg_parity
    return pg_parity


def test_parity_fast_suites(harness):
    total = harness.run_parity(["nogrp_agg", "zero_agg", "recheck_agg"],
                               max_diffs=5)
    assert total["diff"] == 0 and total["error"] == 0, total
    # 255 comparable statements across nogrp_agg(126)/zero_agg/recheck_agg
    assert total["match"] == 255


def test_parity_where_overflow(harness):
    total = harness.run_parity(["where_agg", "overflow_agg"], max_diffs=5)
    assert total["diff"] == 0 and total["error"] == 0, total


def test_parity_group_with_mix_join(harness):
    total = harness.run_parity(["group_agg"], max_diffs=5)
    assert total["diff"] == 0 and total["error"] == 0, total
    assert total["match"] == 153
