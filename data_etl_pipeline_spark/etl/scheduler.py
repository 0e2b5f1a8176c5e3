"""Resource-aware batch scheduling (SURVEY ST6 — batch_file_station.py:361-441,
api_key_bundle.py:15-75).

The reference meters work through API-key bundles: per-key token quotas,
one in-flight batch per key, cooldowns after completion (600 s success /
1800 s failure). This is driver-side control flow, not a dataflow operator —
the Spark translation keeps it as a small deterministic planner that decides
WHICH pending work ships this tick; the shipping itself is the distributed
JSONL sink (sources/jsonl.py).

State is plain rows so it can live in a Delta/Parquet table between ticks.
"""

from __future__ import annotations

import dataclasses

SUCCESS_COOLDOWN_S = 600
FAILURE_COOLDOWN_S = 1800


@dataclasses.dataclass
class KeyBundle:
    key_id: str
    token_quota: int
    tokens_in_use: int = 0
    in_flight_batch: str | None = None
    available_at: float = 0.0  # epoch seconds

    def available(self, now: float) -> bool:
        return self.in_flight_batch is None and now >= self.available_at

    def headroom(self) -> int:
        return max(0, self.token_quota - self.tokens_in_use)


def plan_tick(
    bundles: list[KeyBundle],
    pending: list[tuple[str, int]],  # (work_id, num_tokens), smallest-first
    now: float,
) -> dict[str, list[str]]:
    """Assign pending work to available keys under their token headroom.

    Mirrors the reference's loop: iterate keys; an available key takes work
    items (pre-sorted smallest-text-first, SURVEY S3/O2) until its quota is
    reached; one batch per key per tick. Returns key_id -> [work_id].
    Deterministic: same inputs, same plan.
    """
    plan: dict[str, list[str]] = {}
    cursor = 0
    for b in sorted(bundles, key=lambda x: x.key_id):
        if not b.available(now) or cursor >= len(pending):
            continue
        budget = b.headroom()
        took: list[str] = []
        spent = 0
        while cursor < len(pending):
            wid, tok = pending[cursor]
            if took and spent + tok > budget:
                break
            took.append(wid)
            spent += tok
            cursor += 1
            if spent >= budget:
                break
        if took:
            plan[b.key_id] = took
    return plan


def complete_batch(bundle: KeyBundle, now: float, success: bool) -> KeyBundle:
    """Release a key after its batch lands: clear in-flight, start cooldown
    (ST6), reset token accounting (the reference recounts on poll)."""
    return dataclasses.replace(
        bundle,
        in_flight_batch=None,
        tokens_in_use=0,
        available_at=now + (SUCCESS_COOLDOWN_S if success else FAILURE_COOLDOWN_S),
    )


def detect_version_drift(current, processed, key: str = "entity", version_col: str = "version_id"):
    """ST7: versioned reprocessing trigger — entities whose current content
    version differs from the last processed version (or were never
    processed) need re-extraction. Plain anti-join on (key, version).

    Both args are DataFrames with columns [key, version_col].
    """
    return current.join(processed, [key, version_col], "left_anti")
