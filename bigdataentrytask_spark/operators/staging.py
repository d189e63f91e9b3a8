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

from bigdataentrytask_spark.operators import load_all, operator

# Operator modules compose each other's ORACLES at import time
# (e.g. text_analysis reads curation's quality_classifier_score), so
# the registry must be fully loaded IN ITS CANONICAL ORDER before the
# per-module staged dicts are imported below.
load_all()

from bigdataentrytask_spark.operators.dedup import (  # noqa: E402
    ROUND10_STAGED as _DEDUP_STAGED,
)
from bigdataentrytask_spark.operators.star import (  # noqa: E402
    ROUND10_STAGED as _STAR_STAGED,
)
from bigdataentrytask_spark.operators.similarity import (  # noqa: E402
    ROUND10_STAGED as _SIMILARITY_STAGED,
)
from bigdataentrytask_spark.operators.text_analysis import (  # noqa: E402
    ROUND10_STAGED as _TEXT_STAGED,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND10_STAGED as _STREAMING_STAGED,
)
from bigdataentrytask_spark.operators.warehouse import (  # noqa: E402
    ROUND10_STAGED as _WAREHOUSE_STAGED,
)

STAGED: dict[str, tuple] = {
    **_DEDUP_STAGED,
    **_SIMILARITY_STAGED,
    **_STAR_STAGED,
    **_STREAMING_STAGED,
    **_TEXT_STAGED,
    **_WAREHOUSE_STAGED,
}


def register_all() -> None:
    """Register every staged operator (round-10 boundary only)."""
    for name, (fn, osql) in STAGED.items():
        operator(name, oracle=osql)(fn)
