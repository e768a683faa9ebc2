"""Unit pins for tools/round_close.py (r12 verdict item 1) — the
round-end step that regenerates the determinism and partition-invariance
receipts and refuses to certify a dirty tree. Pure-function tests; the
git-querying wrappers are exercised by running the tool itself at round
end (its printed ordering check is the receipt).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import round_close  # noqa: E402


def test_code_paths_flagged_artifacts_pass():
    porcelain = "\n".join(
        [
            " M mapreduce_code_spark/session.py",
            " M tools/scale_probe.py",
            "?? tests/test_new.py",
            " M __spark_entry__.py",
            " M bench.py",
            " M SURVEY.md",  # round artifact: fine to be dirty
            "?? DETERMINISM_r13.json",  # the receipt itself: fine
            "?? probe1000_stderr.log",
        ]
    )
    got = round_close.classify_dirty(porcelain)
    assert got == [
        "mapreduce_code_spark/session.py",
        "tools/scale_probe.py",
        "tests/test_new.py",
        "__spark_entry__.py",
        "bench.py",
    ]


def test_rename_entry_uses_destination_path():
    # porcelain rename lines are "R  old -> new"; the receipt cares
    # about what is dirty NOW, i.e. the destination
    porcelain = "R  SURVEY.md -> tools/new_tool.py"
    assert round_close.classify_dirty(porcelain) == ["tools/new_tool.py"]


def test_clean_tree_yields_nothing():
    assert round_close.classify_dirty("") == []
