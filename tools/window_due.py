"""Print the window-curation claim list for the NEXT driver round.

The staleness lint (tests/test_registry_window.py) hard-fails only when
an artifact lands without a row for an entry past its tier cadence —
i.e. only when curation already missed.  This tool answers the curation
question one step earlier: given artifacts through round R, which
entries will fire when CORRECTNESS_r{R+1} lands unless the round-(R+1)
DRIVER_WINDOW contains them?  Run it before writing the round's first
(curation) commit; the printed set is the mandatory claim, the rest of
the 50 slots are free for new ops, rewrites and prefills.

Usage: python tools/window_due.py [--next-round N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_TIER_CADENCE = {1: 3, 2: 4, 3: 5}


def _tier(name: str, spec) -> int:
    if spec.bench:
        return 1
    if name[0] in "ptms" and name[1].isdigit():
        return 2
    return 3


def main() -> None:
    from sqlrs_spark.registry import DRIVER_WINDOW, REWRITE_DEBT, all_specs

    latest: dict[str, int] = {}
    max_round = 0
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        max_round = max(max_round, rnd)
        with open(p) as f:
            for k in json.load(f):
                latest[k] = max(latest.get(k, 0), rnd)

    ap = argparse.ArgumentParser()
    ap.add_argument("--next-round", type=int, default=max_round + 1)
    args = ap.parse_args()
    nxt = args.next_round

    specs = all_specs()
    due: list[tuple[str, int, int]] = []
    for n, s in specs.items():
        c = _TIER_CADENCE[_tier(n, s)]
        lr = latest.get(n, 0)
        # mirror of the lint threshold, evaluated at R = next round
        if lr < nxt - (c - 1):
            due.append((n, lr, _tier(n, s)))
    debt = sorted(set(REWRITE_DEBT) - {n for n, _, _ in due})

    claim = sorted({n for n, _, _ in due} | set(REWRITE_DEBT))
    missing = [n for n in claim if n not in DRIVER_WINDOW]
    print(f"# artifacts through r{max_round}; claim for the r{nxt} window")
    for n, lr, t in sorted(due):
        mark = "" if n in DRIVER_WINDOW else "   <-- NOT in DRIVER_WINDOW"
        print(f"due   {n}  latest=r{lr}  tier{t}{mark}")
    for n in debt:
        mark = "" if n in DRIVER_WINDOW else "   <-- NOT in DRIVER_WINDOW"
        print(f"debt  {n}  REWRITE_DEBT(r{REWRITE_DEBT[n]}){mark}")
    print(
        f"# claim {len(claim)} of {len(DRIVER_WINDOW)} slots; "
        f"{len(DRIVER_WINDOW) - len([n for n in claim if n in DRIVER_WINDOW])}"
        f" slots free; {len(missing)} claim entries missing from the window"
    )
    sys.exit(1 if missing else 0)


if __name__ == "__main__":
    main()
