"""Bench instrument-hygiene A/B (r10, verdict item 8): when a round's
bench moves >15% with zero bench-path commits, the question is "engine
or machine?" — answer it by running a PRIOR round's tree on TODAY'S
machine. Same code + different number = the instrument moved (the r9
verdict proved +31% was machine drift exactly this way); different
number only for the new tree = a real regression.

Usage:
    python scripts/bench_ab.py <old_ref> [<new_ref>]

<old_ref> is checked out into a temporary git worktree and its bench.py
run there; <new_ref> defaults to the CURRENT working tree (uncommitted
changes included). Prints one comparison line and exits 0; record the
numbers in SCALE.md next to the round's BENCH entry.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_bench(tree: str) -> dict:
    """Run `python bench.py` with cwd OUTSIDE the tree (the driver's
    posture — masks nothing) and parse the one JSON line."""
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(
        f"bench.py in {tree} emitted no JSON line\n--- stderr ---\n"
        + out.stderr[-2000:]
    )


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    old_ref = sys.argv[1]
    new_ref = sys.argv[2] if len(sys.argv) > 2 else None

    def worktree_bench(ref: str) -> dict:
        path = f"/tmp/bench_ab_{ref.replace('/', '_')}"
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--force", path, ref],
            check=True,
            capture_output=True,
        )
        try:
            return run_bench(path)
        finally:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", path],
                capture_output=True,
            )

    old = worktree_bench(old_ref)
    new = worktree_bench(new_ref) if new_ref else run_bench(REPO)
    ratio = new["value"] / old["value"] if old["value"] else float("nan")
    print(
        json.dumps(
            {
                "old_ref": old_ref,
                "old_sec": old["value"],
                "new_ref": new_ref or "WORKING-TREE",
                "new_sec": new["value"],
                "new_over_old": round(ratio, 4),
                "loadavg": os.getloadavg(),
                "verdict": (
                    "same-machine ratio inside the honest band — compare "
                    "against SCALE.md's session band before calling a "
                    "regression"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
