"""Same-boot bench A/B: previous-round tip vs the current tree.

The driver's ``BENCH_r{N}.json`` files are captured in different boots
and are NOT comparable across rounds (machine drift of 1.4× between
captures fabricated a phantom regression in r16 that cost the judge a
re-measurement).  This script is the committed fix (r16 verdict item
3): run the previous round's tip and the current tree back-to-back in
ONE boot, on the same headline set, and write
``BENCH_sameboot_r{N}.json`` with per-query medians and the common-set
ratio — the number the judge can trust without re-running anything.

    python scripts/bench_ab.py [prev_ref]

``prev_ref`` defaults to the newest ``round N:`` commit (the driver's
round-closing record commit).  The previous tip runs from a temporary
git worktree; the current tree runs from the repo root.  Each side is
a fresh ``bench.py`` subprocess (own JVM), sequential on an otherwise
idle box — "one boot" here means one machine session, minutes apart,
which is what kills the cross-boot drift term.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sh(args: list[str], **kw) -> str:
    return subprocess.run(
        args, check=True, capture_output=True, text=True, **kw
    ).stdout


def _default_prev_ref() -> str:
    log = _sh(["git", "-C", ROOT, "log", "--oneline", "-200"])
    for line in log.splitlines():
        sha, _, msg = line.partition(" ")
        if re.match(r"round \d+:", msg):
            return sha
    raise SystemExit("no 'round N:' commit found; pass prev_ref explicitly")


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f))
    ]
    return (max(rounds) if rounds else 0) + 1


def _run_bench(root: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        check=True,
        capture_output=True,
        text=True,
        cwd=root,
        env=env,
    ).stdout
    # bench.py prints ONE JSON line on stdout (stderr carries progress)
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in bench output from {root!r}")


def main() -> None:
    prev_ref = sys.argv[1] if len(sys.argv) > 1 else _default_prev_ref()
    rnd = _current_round()
    wt = f"/tmp/bench_ab_prev_{prev_ref[:8]}"
    _sh(["git", "-C", ROOT, "worktree", "add", "--force", wt, prev_ref])
    try:
        print(f"# previous tip {prev_ref} -> {wt}", file=sys.stderr)
        prev = _run_bench(wt)
        print("# current tree", file=sys.stderr)
        cur = _run_bench(ROOT)
    finally:
        subprocess.run(
            ["git", "-C", ROOT, "worktree", "remove", "--force", wt],
            check=False,
        )
    common = sorted(set(prev["queries"]) & set(cur["queries"]))
    prev_total = round(sum(prev["queries"][q] for q in common), 3)
    cur_total = round(sum(cur["queries"][q] for q in common), 3)
    per_query = {
        q: {
            "prev": prev["queries"][q],
            "cur": cur["queries"][q],
            "ratio": round(cur["queries"][q] / prev["queries"][q], 3)
            if prev["queries"][q]
            else None,
        }
        for q in common
    }
    ratios = [v["ratio"] for v in per_query.values() if v["ratio"]]
    record = {
        "round": rnd,
        "prev_ref": prev_ref,
        "boot": "single-session back-to-back (prev first)",
        "sf": cur.get("sf"),
        "common_queries": len(common),
        "common_prev_sec": prev_total,
        "common_cur_sec": cur_total,
        "common_ratio": round(cur_total / prev_total, 3) if prev_total else None,
        "median_query_ratio": round(statistics.median(ratios), 3)
        if ratios
        else None,
        "new_queries": sorted(set(cur["queries"]) - set(prev["queries"])),
        "new_queries_sec": round(
            sum(
                t
                for q, t in cur["queries"].items()
                if q not in prev["queries"]
            ),
            3,
        ),
        "queries": per_query,
    }
    path = os.path.join(ROOT, f"BENCH_sameboot_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in record.items() if k != "queries"}))
    print(f"# written {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
