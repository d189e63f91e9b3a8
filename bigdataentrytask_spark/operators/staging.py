"""Staging aggregator. Round-9 history: the registry was FROZEN
through round 9 (VERDICT r8 items 2/6), so operators built then lived
in per-module ROUND10_STAGED dicts and registered only via
register_all(). ACTIVATED at the round-10 boundary (VERDICT r9
item 1): operators.load_all() now calls register_all(), so every
staged operator is live in the registry (415 + 17 = 432). Round-11
boundary (VERDICT r10 item 1) activated the 22 ROUND11_STAGED ops the
same way (432 + 22 = 454).

The dicts stay as the registration vehicle (their entries are the
single source for name -> (fn, oracle)); future rounds that stage
work during a freeze add ROUND{N}_STAGED dicts here following the
canonical procedure in CONTRIBUTING.md §"Staging operators during a
registry freeze". scripts/roundcheck.py runs the staged-only gates
only while some staged name is NOT yet registered.
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

# Round-10 set — ACTIVATED (registered into REGISTRY by register_all,
# which load_all() calls; the dicts remain the single source for
# name -> (fn, oracle)).
ROUND10_ACTIVATED: dict[str, tuple] = {
    **_DEDUP_STAGED,
    **_SIMILARITY_STAGED,
    **_STAR_STAGED,
    **_STREAMING_STAGED,
    **_TEXT_STAGED,
    **_WAREHOUSE_STAGED,
}

# Round-11 set — ACTIVATED at the round-11 boundary (VERDICT r10
# item 1): the 22 operators staged during round 10 (per-module
# ROUND11_STAGED dicts) now register via register_all() below.
from bigdataentrytask_spark.operators.dedup import (  # noqa: E402
    ROUND11_STAGED as _DEDUP_R11,
)
from bigdataentrytask_spark.operators.similarity import (  # noqa: E402
    ROUND11_STAGED as _SIMILARITY_R11,
)
from bigdataentrytask_spark.operators.warehouse import (  # noqa: E402
    ROUND11_STAGED as _WAREHOUSE_R11,
)
from bigdataentrytask_spark.operators.text_analysis import (  # noqa: E402
    ROUND11_STAGED as _TEXT_R11,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND11_STAGED as _STREAMING_R11,
)
from bigdataentrytask_spark.operators.curation import (  # noqa: E402
    ROUND11_STAGED as _CURATION_R11,
)

ROUND11_ACTIVATED: dict[str, tuple] = {
    **_CURATION_R11,
    **_DEDUP_R11,
    **_SIMILARITY_R11,
    **_STREAMING_R11,
    **_TEXT_R11,
    **_WAREHOUSE_R11,
}

# Round-12 set — ACTIVATED at the round-12 boundary (VERDICT r11
# item 1): the 16 operators staged during round 11 (per-module
# ROUND12_STAGED dicts) now register via register_all() below.
from bigdataentrytask_spark.operators.dedup import (  # noqa: E402
    ROUND12_STAGED as _DEDUP_R12,
)
from bigdataentrytask_spark.operators.similarity import (  # noqa: E402
    ROUND12_STAGED as _SIMILARITY_R12,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND12_STAGED as _STREAMING_R12,
)
from bigdataentrytask_spark.operators.text_analysis import (  # noqa: E402
    ROUND12_STAGED as _TEXT_R12,
)
from bigdataentrytask_spark.operators.warehouse import (  # noqa: E402
    ROUND12_STAGED as _WAREHOUSE_R12,
)
from bigdataentrytask_spark.operators.curation import (  # noqa: E402
    ROUND12_STAGED as _CURATION_R12,
)

ROUND12_ACTIVATED: dict[str, tuple] = {
    **_CURATION_R12,
    **_DEDUP_R12,
    **_SIMILARITY_R12,
    **_STREAMING_R12,
    **_TEXT_R12,
    **_WAREHOUSE_R12,
}

# Round-13 set — ACTIVATED at the round-13 boundary (memory:
# round13-activation): the 14 operators staged during round 12
# (per-module ROUND13_STAGED dicts) now register via register_all().
from bigdataentrytask_spark.operators.curation import (  # noqa: E402
    ROUND13_STAGED as _CURATION_R13,
)
from bigdataentrytask_spark.operators.dedup import (  # noqa: E402
    ROUND13_STAGED as _DEDUP_R13,
)
from bigdataentrytask_spark.operators.similarity.lloyd import (  # noqa: E402
    ROUND13_STAGED as _SIMILARITY_R13,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND13_STAGED as _STREAMING_R13,
)
from bigdataentrytask_spark.operators.text_analysis import (  # noqa: E402
    ROUND13_STAGED as _TEXT_R13,
)
from bigdataentrytask_spark.operators.warehouse import (  # noqa: E402
    ROUND13_STAGED as _WAREHOUSE_R13,
)

ROUND13_ACTIVATED: dict[str, tuple] = {
    **_CURATION_R13,
    **_DEDUP_R13,
    **_SIMILARITY_R13,
    **_STREAMING_R13,
    **_TEXT_R13,
    **_WAREHOUSE_R13,
}

# Round-14 set — ACTIVATED at the round-14 boundary (VERDICT r13
# item 1): the 14 operators staged during round 13 (per-module
# ROUND14_STAGED dicts) now register via register_all() below.
from bigdataentrytask_spark.operators.curation import (  # noqa: E402
    ROUND14_STAGED as _CURATION_R14,
)
from bigdataentrytask_spark.operators.similarity.residual import (  # noqa: E402
    ROUND14_STAGED as _SIMILARITY_R14,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND14_STAGED as _STREAMING_R14,
)
from bigdataentrytask_spark.operators.text_analysis import (  # noqa: E402
    ROUND14_STAGED as _TEXT_R14,
)
from bigdataentrytask_spark.operators.warehouse import (  # noqa: E402
    ROUND14_STAGED as _WAREHOUSE_R14,
)

ROUND14_ACTIVATED: dict[str, tuple] = {
    **_CURATION_R14,
    **_SIMILARITY_R14,
    **_STREAMING_R14,
    **_TEXT_R14,
    **_WAREHOUSE_R14,
}

# PENDING set — staged for the NEXT round boundary, NOT registered.
# preverify --staged / layout_scan --staged / roundcheck's staged
# steps read this; fed by the per-module ROUND15_STAGED dicts.
from bigdataentrytask_spark.operators.curation import (  # noqa: E402
    ROUND15_STAGED as _CURATION_R15,
)
from bigdataentrytask_spark.operators.similarity.probes import (  # noqa: E402
    ROUND15_STAGED as _SIMILARITY_R15,
)
from bigdataentrytask_spark.operators.streaming_bridge import (  # noqa: E402
    ROUND15_STAGED as _STREAMING_R15,
)
from bigdataentrytask_spark.operators.warehouse.compaction import (  # noqa: E402
    ROUND15_STAGED as _WAREHOUSE_R15,
)

STAGED: dict[str, tuple] = {
    **_CURATION_R15,
    **_SIMILARITY_R15,
    **_STREAMING_R15,
    **_WAREHOUSE_R15,
}


def register_all() -> None:
    """Register every ACTIVATED operator (idempotent — the @operator
    decorator tolerates re-registration of the same function).
    Entries in STAGED are pending and deliberately NOT registered."""
    for name, (fn, osql) in ROUND10_ACTIVATED.items():
        operator(name, oracle=osql)(fn)
    for name, (fn, osql) in ROUND11_ACTIVATED.items():
        operator(name, oracle=osql)(fn)
    for name, (fn, osql) in ROUND12_ACTIVATED.items():
        operator(name, oracle=osql)(fn)
    for name, (fn, osql) in ROUND13_ACTIVATED.items():
        operator(name, oracle=osql)(fn)
    for name, (fn, osql) in ROUND14_ACTIVATED.items():
        operator(name, oracle=osql)(fn)


# Round-10 activation closing step: if this module was imported
# DIRECTLY (not via load_all's activation branch), the load_all() call
# at the top of this file deliberately skipped activation because
# register_all did not exist yet — finish it here so `import staging`
# always leaves the registry complete, regardless of import order.
from bigdataentrytask_spark import operators as _ops  # noqa: E402

if not _ops._ACTIVATED:
    _ops._ACTIVATED = True
    register_all()
