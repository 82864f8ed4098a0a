"""Regenerate PLANS.md: formatted physical plans of every bench query.

Run from the repo root: python tools/plandump.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# PLANS — physical plans of the bench query set (auto-generated)

`explain("formatted")` of every bench-flagged query at sf0.1 on the
session config from `sqlrs_spark.session.build_spark` (AQE on, initial
plans shown — AQE refines exchanges at runtime). Regenerate with
`python tools/plandump.py` after changing any bench query.

Reading guide: `PushedFilters`/`ReadSchema` on Scan nodes show pushdown
and pruning; `BroadcastHashJoin` = dimension broadcast (no fact shuffle);
`Exchange hashpartitioning` = a real shuffle — the plans below keep those
to the single agg/join key each query needs; `HashAggregate` pairs are
map-side partial + final.
"""


def main() -> None:
    from sqlrs_spark.plans.checks import explain_str
    from sqlrs_spark.registry import all_specs
    from sqlrs_spark.session import build_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark("plandump", cores=8, shuffle_partitions=8)
    out = [HEADER]
    for name, spec in all_specs().items():
        if not spec.bench:
            continue
        plan = explain_str(spec.fn(spark, sf), "formatted")
        out.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
