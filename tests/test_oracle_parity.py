"""Full-registry oracle parity as a pytest invariant (`pytest -m oracle`).

The driver's per-round CORRECTNESS gate samples ~50 of the registry's
queries; the never-sampled rest used to be covered only by the manual
round-close `tools/verify_oracle.py` ritual. This module parametrizes
over EVERY registered query at sf0.001 and asserts the same row-count +
column-name + order-insensitive value comparison the driver runs, so
"all queries match" is one `python -m pytest tests/ -m oracle -q` away
and a forgotten ritual can't hide a parity break.

Opt-in by marker (registered + excluded-by-default in pytest.ini): the
full sweep costs minutes, too heavy for the default suite. Queries
without an oracle (approximate by design — each anchored by a hash-green
exact twin) get the driver's weaker runs-and-returns-rows check.

Scale is env-selectable — the round-close both-scales ritual is:

    python -m pytest tests/test_oracle_parity.py -m oracle -q
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.01 \
        python -m pytest tests/test_oracle_parity.py -m oracle -q
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from conftest import SF_DIR as _DEFAULT_SF  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", _DEFAULT_SF)

from stock_market_etl_pipeline_spark import registry  # noqa: E402
from tools.verify_oracle import compare_query, duck_connect  # noqa: E402

pytestmark = pytest.mark.oracle

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn = _QUERIES[name]
    if name not in _ORACLES:
        # rows-only by design (approx sketches / sub-exhaustive ANN):
        # assert it runs and produces rows; exactness is certified by the
        # query's hash-green exact twin and its pytest error-bound tests.
        assert len(fn(spark, SF_DIR).collect()) > 0
        return
    problems = compare_query(spark, duck, SF_DIR, name, fn, _ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)
