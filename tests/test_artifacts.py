"""Round-evidence guard: driver artifacts on disk must be git-tracked.

Round 5's ``CORRECTNESS_r05.json`` / ``BENCH_r05.json`` vanished (never
committed), erasing the only driver evidence for 25 workloads. This test
makes the failure loud: any ``CORRECTNESS_r*.json`` / ``BENCH_r*.json``
sitting untracked in the repo root turns the suite red until committed.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _tracked(pattern: str) -> set[str]:
    out = subprocess.run(
        ["git", "ls-files", pattern],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    )
    return set(out.stdout.split())


def test_driver_artifacts_are_git_tracked():
    on_disk = {
        p.name
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in REPO.glob(pat)
    }
    tracked = _tracked("CORRECTNESS_r*.json") | _tracked("BENCH_r*.json")
    untracked = sorted(on_disk - tracked)
    assert not untracked, (
        f"driver artifacts not committed: {untracked} — round evidence "
        "disappears on workspace reset (round 5's did); `git add` them"
    )
