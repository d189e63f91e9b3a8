"""Fast guard: every oracle SQL must at least PLAN in DuckDB against
the registered views (catches typos, bad casts, nonexistent columns
without running anything). The full differential sweep proves values;
this proves syntax/binding in milliseconds per query."""

import pytest

from bigdataentrytask_spark.operators import ORACLES, load_all

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_plans(duck, name):
    # EXPLAIN forces full bind/plan without executing
    duck.execute(f"EXPLAIN {ORACLES[name]}")
