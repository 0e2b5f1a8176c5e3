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
    result to the view's aggregation with sign-weighted sums."""
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
