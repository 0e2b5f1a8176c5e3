#!/usr/bin/env python3
"""Compute — and rewrite — the driver-verification front-50 in
``plans/registry.py``.

The external driver's CORRECTNESS run samples the FIRST 50 declared
queries per round, so ``_VERIFY_FIRST`` decides which queries get a
fresh driver row. Hand-curating that list caused stale-row pileups
(round 5) and a 67-query never-tested backlog (round 7). This script
makes the rotation mechanical:

ordering rule
    1. judge-named carry-over pins (``PINS`` below), in order;
    2. queries with NO driver row in any ``CORRECTNESS_r*.json``,
       oldest declaration first (``QuerySpec.round_added`` ascending,
       then name) — new queries never jump the queue;
    3. everything else, stalest driver row first (latest round
       ascending, then name).

usage
    python scripts/rotate_verify_front.py            # rewrite registry.py
    python scripts/rotate_verify_front.py --check    # exit 1 if the
                                                     # committed list drifts
    python scripts/rotate_verify_front.py --print    # show the computed order

The rewrite targets the BEGIN/END GENERATED FRONT markers in
registry.py; a test (tests/test_rotation.py) runs --check so CI fails
when the list drifts from the computed order.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGISTRY = os.path.join(REPO, "data_etl_pipeline_spark", "plans", "registry.py")
FRONT_SIZE = 50

# Judge-named carry-overs that must lead the next front regardless of the
# mechanical order. A pin deactivates AUTOMATICALLY once the query has a
# driver row (order_names filters on `latest`), so satisfied pins are
# inert — prune them here for readability, not correctness.
PINS: list[str] = [
    "ivm_join_view",  # VERDICT r7 "Next round" item 1: must lead round 8
]

BEGIN = "# --- BEGIN GENERATED FRONT (scripts/rotate_verify_front.py) ---"
END = "# --- END GENERATED FRONT ---"


def driver_rounds(repo: str = REPO) -> dict[str, int]:
    """name -> latest driver round with a CORRECTNESS row for it."""
    latest: dict[str, int] = {}
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", p)
        if not m:
            continue
        r = int(m.group(1))
        with open(p) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), r)
    return latest


def computed_front(latest: dict[str, int] | None = None) -> list[str]:
    """The front-50 the ordering rule produces for the CURRENT registry."""
    sys.path.insert(0, REPO)
    from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    if latest is None:
        latest = driver_rounds()
    return order_names(
        list(QUERIES),
        latest,
        {n: QUERIES[n].round_added for n in QUERIES},
        PINS,
    )[:FRONT_SIZE]


def order_names(
    names: list[str],
    latest: dict[str, int],
    round_added: dict[str, int],
    pins: list[str],
) -> list[str]:
    """Pure ordering rule (unit-testable without Spark or the registry).
    A pin is active only while its query has NO driver row — once tested,
    it rejoins the mechanical order instead of displacing never-tested
    queries from the window."""
    pinned = [n for n in pins if n in names and n not in latest]
    rest = [n for n in names if n not in set(pinned)]
    never = sorted(
        (n for n in rest if n not in latest),
        key=lambda n: (round_added.get(n, 0), n),
    )
    tested = sorted(
        (n for n in rest if n in latest),
        key=lambda n: (latest[n], n),
    )
    return pinned + never + tested


def current_front(path: str = REGISTRY) -> list[str]:
    """Parse the committed _VERIFY_FIRST block out of registry.py."""
    src = open(path).read()
    try:
        block = src.split(BEGIN, 1)[1].split(END, 1)[0]
    except IndexError:
        raise SystemExit(f"markers not found in {path}")
    return re.findall(r'"([^"]+)"', block)


def rewrite(front: list[str], path: str = REGISTRY) -> None:
    src = open(path).read()
    head, rest = src.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    body = "\n".join(f'    "{n}",' for n in front)
    open(path, "w").write(f"{head}{BEGIN}\n{body}\n    {END}{tail}")


def main(argv: list[str]) -> int:
    front = computed_front()
    if "--print" in argv:
        print("\n".join(front))
        return 0
    committed = current_front()
    if "--check" in argv:
        if committed != front:
            drift = [
                f"  pos {i}: committed={c!r} computed={g!r}"
                for i, (c, g) in enumerate(zip(committed, front))
                if c != g
            ]
            extra = abs(len(committed) - len(front))
            print(
                f"_VERIFY_FIRST drifted from the computed order "
                f"({len(drift)} mismatches, {extra} length delta):\n"
                + "\n".join(drift[:10])
            )
            print("run: python scripts/rotate_verify_front.py")
            return 1
        print(f"_VERIFY_FIRST matches the computed front-{len(front)}")
        return 0
    if committed == front:
        print("already up to date")
        return 0
    rewrite(front)
    print(f"rewrote _VERIFY_FIRST with {len(front)} names")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
