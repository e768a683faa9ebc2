"""Unit pins for the r13 advisor-low fixes in the audit tools.

Covers: (1) determinism_audit._head_sha stamps ``-dirty`` when — and
only when — the working tree has uncommitted CODE changes, using
round_close's own classifier so the two tools can't disagree; (2) the
partition-invariance audit's VACUOUS escape hatch: a 0-row OK result
is fatal unless the query is on the pinned EMPTY_OK_QUERIES allowlist,
in which case it surfaces as the distinct VACUOUS_ALLOWED status;
(3) tools/ sibling imports work without the implicit script-dir path
entry (driver_check imported as a module, not run as a script).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import determinism_audit  # noqa: E402
import partition_invariance_audit as pia  # noqa: E402
import round_close  # noqa: E402


def test_head_sha_matches_git_and_is_clean_or_dirty_consistently():
    """_head_sha's base sha is HEAD, and the -dirty suffix appears
    exactly when round_close's classifier sees dirty code paths — the
    same predicate round_close refuses on, so a receipt stamped by a
    tree round_close would reject can never carry a clean sha."""
    sha = determinism_audit._head_sha()
    assert sha is not None
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    dirty_now = bool(round_close.dirty_code_paths())
    assert sha == (f"{head}-dirty" if dirty_now else head)


def test_empty_ok_allowlist_is_currently_empty_and_pinned():
    """Every registered query returns rows at sf0.01 (the r13 receipt
    proved it), so the allowlist must stay empty until a genuinely
    empty-by-design query is registered — growing it is a reviewable
    diff here, not a silent audit relaxation."""
    assert pia.EMPTY_OK_QUERIES == frozenset()


def test_vacuous_status_fatal_off_list_allowed_on_list(monkeypatch):
    """The exact branch the audit runs on a 0-row OK result: fatal
    VACUOUS off the allowlist, non-fatal VACUOUS_ALLOWED on it."""
    assert pia.vacuous_status("regression_sgd_linear") == ("VACUOUS", True)
    monkeypatch.setattr(
        pia, "EMPTY_OK_QUERIES", frozenset({"some_integrity_check"})
    )
    assert pia.vacuous_status("some_integrity_check") == (
        "VACUOUS_ALLOWED",
        False,
    )


def test_blowup_builder_name_matches_cleaner_regex():
    """The scale probe's tier naming lives in ONE place: whatever
    blowup_dir() writes, cleanup_blowups()'s regex must match (review
    finding: a scheme bump stranding tiers the cleaner can't see), and
    lookalike /tmp names must NOT match."""
    import re

    import scale_probe

    base = Path(scale_probe.blowup_dir(1000, "/root/testdata/sf0.1")).name
    assert re.match(scale_probe._BLOWUP_RE, base)
    for lookalike in ("scale_relax_v1_data", "scale10x_v2_short", "scales"):
        assert not re.match(scale_probe._BLOWUP_RE, lookalike)


def test_driver_check_importable_as_module_without_script_dir():
    """`from compare import ...` inside driver_check must not depend on
    the caller having tools/ on sys.path already (r13 advisor low:
    `python -m tools.driver_check` and module imports lacked the
    implicit script-dir entry). Import in a clean subprocess whose
    sys.path has the REPO ROOT only."""
    code = (
        "import sys; sys.path[:0] = [%r]; "
        "import importlib.util as u; "
        "spec = u.spec_from_file_location('dc', %r); "
        "m = u.module_from_spec(spec); spec.loader.exec_module(m); "
        "assert callable(m.frames_match) and callable(m.normalize)"
        % (str(REPO), str(REPO / "tools" / "driver_check.py"))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
