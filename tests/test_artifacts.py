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
    # Artifacts newer than HEAD are the driver's post-final-commit writes
    # (it records round N's JSONs AFTER the round's last commit, so every
    # end-of-round snapshot would otherwise carry this red — round-7
    # verdict); they're exempt here and picked up by the next round's
    # first commit.
    head_time = int(
        subprocess.run(
            ["git", "log", "-1", "--format=%ct"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
    )
    # Bounded margin (round-9, advice item): an unbounded "newer than HEAD"
    # exemption would also exempt genuinely-untracked old artifacts after a
    # workspace restore refreshes every mtime (round 5's were lost exactly
    # that way). The driver writes round N's JSONs minutes after the final
    # commit and round N+1's first commit must track them, so 48 h is ample.
    exempt_until = head_time + 48 * 3600
    on_disk = {
        p.name
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in REPO.glob(pat)
        if not (head_time < p.stat().st_mtime <= exempt_until)
    }
    tracked = _tracked("CORRECTNESS_r*.json") | _tracked("BENCH_r*.json")
    untracked = sorted(on_disk - tracked)
    assert not untracked, (
        f"driver artifacts not committed: {untracked} — round evidence "
        "disappears on workspace reset (round 5's did); `git add` them"
    )


def test_bench_artifact_tail_is_self_contained():
    """Round-8 (verdict item 5): the driver archives only the FINAL 2000
    chars of bench stdout. Simulate a 43-query artifact and assert the
    last-2000-char window still carries every headline dict — queries,
    reruns, sentinel, and value — with per-pass arrays capped to the
    top-3 expensive queries."""
    import json
    import sys

    sys.path.insert(0, str(REPO))
    import bench

    timings = {f"query_with_a_long_name_{i:02d}": 0.1 + i * 0.01 for i in range(43)}
    passes = {n: [t * 3, t, t * 1.1] for n, t in timings.items()}
    sentinel = {
        "floor_sec": 0.01,
        "contended": {"query_with_a_long_name_42": 2.85},
        "load_start": [6.26, 4.1, 3.0],
        "load_end": [3.57, 3.9, 3.1],
    }
    line = bench.render_artifact(
        passes, timings, {"query_with_a_long_name_42": 1}, sentinel, 12.34, 0.1
    )
    parsed = json.loads(line)
    assert set(parsed["passes"]) == {
        "query_with_a_long_name_42",
        "query_with_a_long_name_41",
        "query_with_a_long_name_40",
    }
    tail = line[-2000:]
    # Everything needed for a noise-vs-regression call survives the cut.
    for needle in ('"queries"', '"reruns"', '"sentinel"', '"value"', '"sf"'):
        assert needle in tail, f"{needle} truncated out of the 2000-char tail"
    assert '"query_with_a_long_name_00"' in tail  # full queries dict intact


def test_bench_rerun_predicate_fires_on_spread_and_loadavg():
    """Round-9 (verdict item 3): the rerun predicate must fire on pass
    spread or loadavg growth even when the sentinel probe reads clean —
    round 8's dedup_winnow_top15 (passes 9.0/28.1 vs floor 4.14, loadavg
    2.1→5.3, sentinel silent) slipped through the sentinel-only rule."""
    import sys

    sys.path.insert(0, str(REPO))
    from bench import should_rerun

    # The exact r8 miss: suspicious floor, clean sentinel, 3.1× spread.
    assert should_rerun([9.01, 28.1], floor=4.14, post_ratio=1.0, load_ratio=1.0)
    # Loadavg growth alone also triggers (spread clean, sentinel clean).
    assert should_rerun([9.01, 9.5], floor=4.14, post_ratio=1.0, load_ratio=2.5)
    # Contended sentinel still triggers as before.
    assert should_rerun([9.01, 9.5], floor=4.14, post_ratio=1.4, load_ratio=1.0)
    # Not suspicious (inside 1.5× floor) → never rerun, whatever the signals.
    assert not should_rerun([5.0, 30.0], floor=4.14, post_ratio=3.0, load_ratio=3.0)
    # Suspicious but every contention signal clean → accept the measurement
    # (a real regression must be recordable, not rerun forever).
    assert not should_rerun([9.01, 9.5], floor=4.14, post_ratio=1.0, load_ratio=1.0)
    # No known floor: spread heuristic on a non-trivial query.
    assert should_rerun([1.0, 3.0], floor=None, post_ratio=1.3, load_ratio=1.0)
    # No known floor, trivial query (<0.5 s): noise-band, never rerun.
    assert not should_rerun([0.1, 0.4], floor=None, post_ratio=3.0, load_ratio=3.0)
    assert not should_rerun([], floor=None, post_ratio=3.0, load_ratio=3.0)
