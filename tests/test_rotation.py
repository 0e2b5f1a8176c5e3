"""Verification-front rotation (scripts/rotate_verify_front.py): the
ordering rule, and a drift gate asserting the committed _VERIFY_FIRST
in plans/registry.py matches the computed order — so adding a query or
landing a new CORRECTNESS file without re-running the script fails CI
instead of silently starving the driver rotation."""

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
    got = rot.order_names(names, latest, {}, pins=[])
    assert got == ["b", "c", "d", "a"]  # never (alpha), then stalest first


def test_order_new_queries_do_not_jump_the_queue():
    names = ["old_never", "brand_new"]
    got = rot.order_names(names, {}, {"brand_new": 8}, pins=[])
    assert got == ["old_never", "brand_new"]
    # and round_added ties break alphabetically
    got2 = rot.order_names(["z_new", "a_new"], {}, {"z_new": 8, "a_new": 8}, pins=[])
    assert got2 == ["a_new", "z_new"]


def test_order_pins_lead_and_missing_pins_ignored():
    names = ["x", "y", "z"]
    latest = {"x": 2, "z": 4}  # y never driver-tested -> pin active
    got = rot.order_names(names, latest, {}, pins=["y", "not_declared"])
    assert got == ["y", "x", "z"]


def test_satisfied_pin_deactivates():
    # once the pinned query HAS a driver row it rejoins the mechanical
    # order instead of displacing never-tested queries from the window
    names = ["x", "y", "z"]
    latest = {"x": 2, "y": 9, "z": 4}
    got = rot.order_names(names, latest, {}, pins=["y"])
    assert got == ["x", "z", "y"]  # stalest-first; y is freshest


def test_order_stale_ties_break_alphabetically():
    got = rot.order_names(["b", "a"], {"a": 4, "b": 4}, {}, pins=[])
    assert got == ["a", "b"]


def test_committed_front_matches_computed_order():
    # the real gate: --check exits 0 only when registry.py is current
    out = subprocess.run(
        [sys.executable, SCRIPT, "--check"], capture_output=True, text=True, cwd=REPO
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_front_is_exactly_window_sized():
    front = rot.current_front()
    assert len(front) == rot.FRONT_SIZE
    assert len(set(front)) == rot.FRONT_SIZE  # no duplicates
