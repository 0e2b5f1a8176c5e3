#!/usr/bin/env python3
"""Compute — and rewrite — the driver-verification front-50 in
``plans/registry.py``.

The external driver's CORRECTNESS run samples the FIRST 50 declared
queries per round, so ``_VERIFY_FIRST`` decides which queries get a
fresh driver row. Hand-curating that list caused stale-row pileups
(round 5) and a 67-query never-tested backlog (round 7). This script
makes the rotation mechanical:

ordering rule
    1. judge-named carry-over pins (``PINS`` below), in order — a pin
       stays active until its query has a PASSING driver row in the
       pin's round or later (a FAILED row does not satisfy it);
    2. queries with NO driver row in any ``CORRECTNESS_r*.json``,
       oldest declaration first (``QuerySpec.round_added`` ascending,
       then name) — new queries never jump the queue;
    3. everything else, stalest driver row first (latest round
       ascending, then name).

round-stamping
    The generated block records the latest CORRECTNESS round it was
    computed from (``computed-from: CORRECTNESS <= rN``). ``--check``
    recomputes the order USING ONLY FILES <= THAT ROUND, so the gate
    stays green when the driver drops a newer CORRECTNESS file after
    the last commit — it prints a non-fatal "newer CORRECTNESS present,
    rotate" notice instead of failing one round early.

usage
    python scripts/rotate_verify_front.py            # rewrite registry.py
    python scripts/rotate_verify_front.py --check    # exit 1 if the
                                                     # committed list drifts
    python scripts/rotate_verify_front.py --print    # show the computed order
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
# mechanical order: name -> round the judge named it. A pin deactivates
# AUTOMATICALLY once the query has a PASSING driver row in that round or
# later; a FAILED row keeps it active (the round-8 lesson: the mechanical
# order sorts a fresh-but-red row LAST, deferring the re-test for rounds).
PINS: dict[str, int] = {
    # VERDICT r8 item 1: red in r8 (DATA_SOURCE_PUSHDOWN_DISABLED under the
    # driver's vanilla session); conf now self-scoped — needs a green row.
    "pysource_batch_results": 9,
}

BEGIN = "# --- BEGIN GENERATED FRONT (scripts/rotate_verify_front.py) ---"
END = "# --- END GENERATED FRONT ---"
STAMP_RE = re.compile(r"computed-from: CORRECTNESS <= r(\d+)")


def _row_passed(row: dict) -> bool:
    """A driver row counts as passing unless it errored or any recorded
    match flag is explicitly False (rows-only checks leave hash null)."""
    if row.get("err") is not None:
        return False
    return not any(
        row.get(k) is False for k in ("rows_match", "schema_match", "hash_match")
    )


def correctness_files(repo: str = REPO, max_round: int | None = None) -> list[tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", p)
        if m and (max_round is None or int(m.group(1)) <= max_round):
            out.append((int(m.group(1)), p))
    return sorted(out)


def driver_rounds(
    repo: str = REPO, max_round: int | None = None
) -> tuple[dict[str, int], dict[str, int]]:
    """(latest_any, latest_pass): name -> latest round with any driver
    row / latest round with a PASSING row, over files <= max_round."""
    latest: dict[str, int] = {}
    latest_pass: dict[str, int] = {}
    for r, p in correctness_files(repo, max_round):
        with open(p) as fh:
            for name, row in json.load(fh).items():
                latest[name] = max(latest.get(name, 0), r)
                if isinstance(row, dict) and _row_passed(row):
                    latest_pass[name] = max(latest_pass.get(name, 0), r)
    return latest, latest_pass


def computed_front(max_round: int | None = None) -> list[str]:
    """The front-50 the ordering rule produces for the CURRENT registry,
    considering only CORRECTNESS files <= max_round (None = all)."""
    sys.path.insert(0, REPO)
    from data_etl_pipeline_spark.plans.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    latest, latest_pass = driver_rounds(max_round=max_round)
    return order_names(
        list(QUERIES),
        latest,
        {n: QUERIES[n].round_added for n in QUERIES},
        PINS,
        latest_pass,
    )[:FRONT_SIZE]


def order_names(
    names: list[str],
    latest: dict[str, int],
    round_added: dict[str, int],
    pins: dict[str, int],
    latest_pass: dict[str, int] | None = None,
) -> list[str]:
    """Pure ordering rule (unit-testable without Spark or the registry).
    A pin is active until its query has a PASSING driver row at the
    pin's round or later — once satisfied it rejoins the mechanical
    order instead of displacing never-tested queries from the window."""
    if latest_pass is None:
        latest_pass = latest
    pinned = [
        n for n, pin_round in pins.items()
        if n in names and latest_pass.get(n, -1) < pin_round
    ]
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
    return re.findall(r'"([^"]+)"', _block(path))


def current_stamp(path: str = REGISTRY) -> int | None:
    """The CORRECTNESS round the committed block was computed from."""
    m = STAMP_RE.search(_block(path))
    return int(m.group(1)) if m else None


def _block(path: str) -> str:
    src = open(path).read()
    try:
        return src.split(BEGIN, 1)[1].split(END, 1)[0]
    except IndexError:
        raise SystemExit(f"markers not found in {path}")


def rewrite(front: list[str], stamp: int, path: str = REGISTRY) -> None:
    src = open(path).read()
    head, rest = src.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    body = "\n".join(f'    "{n}",' for n in front)
    open(path, "w").write(
        f"{head}{BEGIN}\n"
        f"    # computed-from: CORRECTNESS <= r{stamp}\n"
        f"{body}\n    {END}{tail}"
    )


def main(argv: list[str]) -> int:
    files = correctness_files()
    latest_round = files[-1][0] if files else 0
    if "--print" in argv:
        print("\n".join(computed_front()))
        return 0
    committed = current_front()
    if "--check" in argv:
        stamp = current_stamp()
        # no stamp (pre-round-9 block): fall back to all files
        front = computed_front(max_round=stamp)
        if committed != front:
            drift = [
                f"  pos {i}: committed={c!r} computed={g!r}"
                for i, (c, g) in enumerate(zip(committed, front))
                if c != g
            ]
            extra = abs(len(committed) - len(front))
            print(
                f"_VERIFY_FIRST drifted from the order computed at "
                f"CORRECTNESS <= r{stamp} "
                f"({len(drift)} mismatches, {extra} length delta):\n"
                + "\n".join(drift[:10])
            )
            print("run: python scripts/rotate_verify_front.py")
            return 1
        msg = f"_VERIFY_FIRST matches the computed front-{len(front)}"
        if stamp is not None and latest_round > stamp:
            msg += (
                f" (stamped r{stamp}; CORRECTNESS_r{latest_round:02d} is newer"
                " — rotate before the next round)"
            )
        print(msg)
        return 0
    front = computed_front()
    if committed == front and current_stamp() == latest_round:
        print("already up to date")
        return 0
    rewrite(front, latest_round)
    print(f"rewrote _VERIFY_FIRST with {len(front)} names (<= r{latest_round})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
