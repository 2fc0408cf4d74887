"""Repo hygiene lint: no stale scratch artifacts may be tracked.

VERDICT r3 item 8: a dev ``err.log`` (and later ``err_review.log``) was
committed at the repo root and alarmed reviewers.  This test fails the
suite whenever a tracked file matches a scratch pattern, so the mistake
cannot recur silently.
"""

from __future__ import annotations

import fnmatch
import pathlib
import subprocess

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

# Patterns that are never legitimate tracked content in this repo.
SCRATCH_PATTERNS = [
    "*.log",
    "*.tmp",
    "*.swp",
    "*.orig",
    "*.rej",
    "err*",          # err.log / err_review.log style root scratch dumps
    "nohup.out",
    "core.*",
    "*.pyc",
    "__pycache__/*",
    "spark-warehouse/*",
    "metastore_db/*",
    ".hypothesis/*",
]

# Tracked names that match a pattern above but are deliberate.
ALLOWLIST: set[str] = set()


def test_no_tracked_scratch_files():
    out = subprocess.run(
        ["git", "ls-files"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    tracked = [line for line in out.splitlines() if line]
    offenders = []
    for path in tracked:
        if path in ALLOWLIST:
            continue
        name = path.rsplit("/", 1)[-1]
        for pat in SCRATCH_PATTERNS:
            target = path if "/" in pat else name
            if fnmatch.fnmatch(target, pat):
                offenders.append((path, pat))
                break
    assert not offenders, (
        "Tracked scratch artifacts found (git rm them or extend ALLOWLIST "
        f"with justification): {offenders}"
    )
