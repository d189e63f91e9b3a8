"""CLI: inspect the operator registry.

  python -m bigdataentrytask_spark list          # all operators
  python -m bigdataentrytask_spark show NAME     # oracle SQL for one
  python -m bigdataentrytask_spark run NAME      # execute at sf0.01
"""

from __future__ import annotations

import sys

from bigdataentrytask_spark.operators import ORACLES, REGISTRY, load_all

DEFAULT_SF = "/root/testdata/sf0.01"


def main(argv: list[str]) -> int:
    load_all()
    cmd = argv[0] if argv else "list"
    if cmd == "list":
        width = max(map(len, REGISTRY))
        for name in sorted(REGISTRY):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:<{width}}  {kind}")
        print(f"\n{len(REGISTRY)} operators ({len(ORACLES)} oracle-backed)")
        return 0
    if cmd == "show" and len(argv) > 1:
        name = argv[1]
        print(ORACLES.get(name, f"(no oracle for {name!r})"))
        return 0
    if cmd == "run" and len(argv) > 1:
        from bigdataentrytask_spark.session import get_spark

        spark = get_spark("cli")
        sf = argv[2] if len(argv) > 2 else DEFAULT_SF
        REGISTRY[argv[1]](spark, sf).show(20, truncate=False)
        spark.stop()
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
