"""Verification-front rotation (scripts/rotate_verify_front.py): the
ordering rule, round-stamped drift gate, and pin semantics. The gate
asserts the committed _VERIFY_FIRST in plans/registry.py matches the
order computed from CORRECTNESS files <= the stamped round — so adding
a query without re-running the script fails CI, while a NEWER driver
CORRECTNESS file landing after the last commit only produces a
non-fatal "rotate" notice instead of a structurally red suite."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "rotate_verify_front.py")

spec = importlib.util.spec_from_file_location("rotate_verify_front", SCRIPT)
rot = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rot)


def test_order_never_tested_before_stale():
    names = ["a", "b", "c", "d"]
    latest = {"a": 5, "d": 3}  # b, c never tested
    got = rot.order_names(names, latest, {}, pins={})
    assert got == ["b", "c", "d", "a"]  # never (alpha), then stalest first


def test_order_new_queries_do_not_jump_the_queue():
    names = ["old_never", "brand_new"]
    got = rot.order_names(names, {}, {"brand_new": 8}, pins={})
    assert got == ["old_never", "brand_new"]
    # and round_added ties break alphabetically
    got2 = rot.order_names(["z_new", "a_new"], {}, {"z_new": 8, "a_new": 8}, pins={})
    assert got2 == ["a_new", "z_new"]


def test_order_pins_lead_and_missing_pins_ignored():
    names = ["x", "y", "z"]
    latest = {"x": 2, "z": 4}  # y never driver-tested -> pin active
    got = rot.order_names(names, latest, {}, pins={"y": 5, "not_declared": 5})
    assert got == ["y", "x", "z"]


def test_satisfied_pin_deactivates():
    # once the pinned query has a PASSING driver row at >= the pin round
    # it rejoins the mechanical order instead of displacing never-tested
    # queries from the window
    names = ["x", "y", "z"]
    latest = {"x": 2, "y": 9, "z": 4}
    got = rot.order_names(names, latest, {}, pins={"y": 9}, latest_pass=latest)
    assert got == ["x", "z", "y"]  # stalest-first; y is freshest


def test_failed_row_keeps_pin_active():
    # the round-8 lesson: pysource_batch_results had a FRESH driver row
    # that was a FAILURE — the mechanical order sorted it last. A pin
    # must treat "tested but red" as unsatisfied.
    names = ["x", "y", "z"]
    latest = {"x": 2, "y": 8, "z": 4}  # y has an r8 row ...
    latest_pass = {"x": 2, "z": 4}  # ... but no PASSING row
    got = rot.order_names(names, latest, {}, pins={"y": 9}, latest_pass=latest_pass)
    assert got == ["y", "x", "z"]
    # a passing row from BEFORE the pin round does not satisfy it either
    got2 = rot.order_names(
        names, latest, {}, pins={"y": 9}, latest_pass={"y": 7}
    )
    assert got2[0] == "y"


def test_row_passed_semantics():
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}
    errored = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}
    mismatched = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    assert rot._row_passed(ok)
    assert rot._row_passed(rows_only)  # weaker rows-only check still counts
    assert not rot._row_passed(errored)
    assert not rot._row_passed(mismatched)


def test_order_stale_ties_break_alphabetically():
    got = rot.order_names(["b", "a"], {"a": 4, "b": 4}, {}, pins={})
    assert got == ["a", "b"]


def test_committed_front_matches_computed_order():
    # the real gate: --check exits 0 only when registry.py matches the
    # order computed from CORRECTNESS files <= the stamped round
    out = subprocess.run(
        [sys.executable, SCRIPT, "--check"], capture_output=True, text=True, cwd=REPO
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_check_survives_newer_correctness_file(tmp_path):
    """A fresh driver CORRECTNESS file landing AFTER the committed front
    must not flip --check red (the r8 judging-time failure) — it only
    changes the notice. Simulated in a repo copy with a fabricated
    CORRECTNESS_r99.json that would reorder everything."""
    import json
    import shutil

    clone = tmp_path / "repo"
    clone.mkdir()
    shutil.copytree(
        os.path.join(REPO, "data_etl_pipeline_spark"),
        clone / "data_etl_pipeline_spark",
    )
    for p in os.listdir(REPO):
        if p.startswith("CORRECTNESS_r") and p.endswith(".json"):
            shutil.copy(os.path.join(REPO, p), clone / p)
    (clone / "scripts").mkdir()
    shutil.copy(SCRIPT, clone / "scripts" / "rotate_verify_front.py")

    env = dict(os.environ, PYTHONPATH=str(clone))
    check = [sys.executable, str(clone / "scripts" / "rotate_verify_front.py"), "--check"]
    base = subprocess.run(check, capture_output=True, text=True, cwd=clone, env=env)
    assert base.returncode == 0, base.stdout + base.stderr

    # every committed-front query "passes" in r99 -> recomputing over all
    # files would push them ALL to the back; the stamp must prevent that
    front = rot.current_front(str(clone / "data_etl_pipeline_spark/plans/registry.py"))
    fake = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in front
    }
    (clone / "CORRECTNESS_r99.json").write_text(json.dumps(fake))
    after = subprocess.run(check, capture_output=True, text=True, cwd=clone, env=env)
    assert after.returncode == 0, after.stdout + after.stderr
    assert "newer" in after.stdout  # non-fatal rotate notice


def test_front_is_exactly_window_sized():
    front = rot.current_front()
    assert len(front) == rot.FRONT_SIZE
    assert len(set(front)) == rot.FRONT_SIZE  # no duplicates
