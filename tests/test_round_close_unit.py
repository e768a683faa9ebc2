"""Unit pins for tools/round_close.py (r12 verdict item 1) — the
round-end step that regenerates the determinism and partition-invariance
receipts and refuses to certify a dirty tree. Pure-function tests; the
git-querying wrappers are exercised by running the tool itself at round
end (its printed ordering check is the receipt).
"""

from __future__ import annotations

import re
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
            " M SURVEY.md",  # root-level round artifact: fine to be dirty
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


def test_rename_into_code_is_dirty():
    porcelain = "R  SURVEY.md -> tools/new_tool.py"
    assert round_close.classify_dirty(porcelain) == ["tools/new_tool.py"]


def test_rename_out_of_code_is_dirty_too():
    # a rename FROM a code path removes code from the tree just as
    # surely as an edit (r13 review finding: destination-only checking
    # let this escape the refusal)
    porcelain = "R  tools/helper.py -> NOTES.md"
    assert round_close.classify_dirty(porcelain) == ["tools/helper.py"]


def test_code_to_code_rename_reports_destination():
    porcelain = "R  tools/old.py -> tools/new.py"
    assert round_close.classify_dirty(porcelain) == ["tools/new.py"]


def test_clean_tree_yields_nothing():
    assert round_close.classify_dirty("") == []


def test_artifact_line_regex_takes_last_match():
    # _run_audit parses the audit's own "artifact: <path>" line — the
    # provenance of what THIS run wrote (glob-newest mtime can certify
    # a receipt the run never produced: refused overwrite, env
    # redirection, fresh checkout)
    out = "noise\nartifact: /a/OLD.json\nmore\nartifact: /a/NEW.json\n"
    m = None
    for m in re.finditer(r"^artifact: (.+)$", out, re.M):
        pass
    assert m and m.group(1) == "/a/NEW.json"
    assert not re.search(r"^artifact: ", "exit without write\n", re.M)
