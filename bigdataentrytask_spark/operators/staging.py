"""Round-10 staging aggregator (VERDICT r8 items 2/6): the registry is
FROZEN through round 9, so operators built this round live in their
natural modules' ROUND10_STAGED dicts and are registered ONLY when
register_all() runs at the round-10 boundary.

NOT imported by operators.load_all() — importing this module is
side-effect-free; only an explicit register_all() call mutates the
registry. Every staged entry is differential-tested in
tests/test_round9_staged.py through the pandas path (the preverify
gate) before it ever consumes a driver sweep slot.

Round-10 activation checklist (CONTRIBUTING.md "Before registering"):
  1. call register_all() from operators.load_all() (one line),
  2. run scripts/preverify.py <staged names> in a vanilla session,
  3. delete the freeze assertion in tests/test_round9_staged.py,
  4. full pytest green.
"""

from __future__ import annotations

from bigdataentrytask_spark.operators import operator
from bigdataentrytask_spark.operators.dedup import (
    ROUND10_STAGED as _DEDUP_STAGED,
)
from bigdataentrytask_spark.operators.star import (
    ROUND10_STAGED as _STAR_STAGED,
)
from bigdataentrytask_spark.operators.similarity import (
    ROUND10_STAGED as _SIMILARITY_STAGED,
)
from bigdataentrytask_spark.operators.streaming_bridge import (
    ROUND10_STAGED as _STREAMING_STAGED,
)
from bigdataentrytask_spark.operators.warehouse import (
    ROUND10_STAGED as _WAREHOUSE_STAGED,
)

STAGED: dict[str, tuple] = {
    **_DEDUP_STAGED,
    **_SIMILARITY_STAGED,
    **_STAR_STAGED,
    **_STREAMING_STAGED,
    **_WAREHOUSE_STAGED,
}


def register_all() -> None:
    """Register every staged operator (round-10 boundary only)."""
    for name, (fn, osql) in STAGED.items():
        operator(name, oracle=osql)(fn)
