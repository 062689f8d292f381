"""Seed/refresh QUIET_LINES.json from every bench record available:
the per-round driver files (BENCH_r*.json), the current
BENCH_FULL.json, and every historical version of BENCH_FULL.json in
git. Quiet = min over all recorded timings per (sf, query) — ambient
load only ever inflates a line, so the historical minimum converges on
the true steady value (the interpretation rule BASELINE.md documents).

Usage: python scripts/build_quiet_lines.py [--table [N]]
  --table also prints a markdown quiet-lines table (top N by quiet
  seconds, default 30) for BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fold(quiet: dict, sf, timings) -> None:
    if sf is None or not isinstance(timings, dict):
        return
    bucket = quiet.setdefault(str(float(sf)), {})
    for name, v in timings.items():
        if isinstance(v, (int, float)):
            v = float(v)
            bucket[name] = min(bucket.get(name, v), v)
        elif isinstance(v, list):  # "slowest" [first, retimed] pairs
            for x in v:
                if isinstance(x, (int, float)):
                    bucket[name] = min(bucket.get(name, float(x)), float(x))


def _fold_doc(quiet: dict, doc) -> None:
    if not isinstance(doc, dict):
        return
    parsed = doc.get("parsed", doc)
    if not isinstance(parsed, dict):
        return
    sf = parsed.get("sf", doc.get("sf"))
    for key in ("queries", "retimed", "slowest"):
        _fold(quiet, sf, parsed.get(key))


def main() -> int:
    quiet: dict[str, dict[str, float]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))) + [
        os.path.join(REPO, "BENCH_FULL.json")
    ]:
        try:
            with open(path) as f:
                _fold_doc(quiet, json.load(f))
        except Exception as exc:
            print(f"skip {path}: {exc}", file=sys.stderr)
    # every committed version of BENCH_FULL.json (per-round full runs)
    try:
        shas = subprocess.run(
            ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.split()
        for sha in shas:
            blob = subprocess.run(
                ["git", "show", f"{sha}:BENCH_FULL.json"],
                cwd=REPO, capture_output=True, text=True,
            )
            if blob.returncode == 0 and blob.stdout.strip():
                try:
                    _fold_doc(quiet, json.loads(blob.stdout))
                except Exception:
                    pass
    except Exception as exc:
        print(f"git history unavailable: {exc}", file=sys.stderr)

    out = os.path.join(REPO, "QUIET_LINES.json")
    # merge with any existing record (never lose a quieter observation)
    try:
        with open(out) as f:
            for sf, vals in json.load(f).items():
                _fold(quiet, sf, vals)
    except Exception:
        pass
    doc = {sf: {k: round(v, 3) for k, v in sorted(vals.items())}
           for sf, vals in sorted(quiet.items())}
    with open(out, "w") as f:
        json.dump(doc, f, indent=0, sort_keys=True)
        f.write("\n")
    n = sum(len(v) for v in doc.values())
    print(f"wrote {out}: {n} (sf, query) quiet lines across {list(doc)}")

    if "--table" in sys.argv:
        idx = sys.argv.index("--table")
        top = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 30
        vals = doc.get("0.1", {})
        print(f"\n| query | quiet sec (sf0.1) |\n|---|---|")
        for k, v in sorted(vals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"| {k} | {v} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
