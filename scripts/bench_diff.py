"""Compare two bench JSON files (BENCH_r{N}.json) per query.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--threshold 0.2]

Prints per-query deltas on the INTERSECTION of query sets (totals are
not comparable when the query list grew), flags regressions whose
relative slowdown exceeds both the threshold and the new run's recorded
noise spread, and summarizes queries present in only one file.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    threshold = 0.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1])
    def load(path):
        # Accepts: the driver's BENCH_r{N}.json ({"parsed": {...}}), a
        # single bench JSON object, or bench.py's RAW stdout (detail
        # line + summary line) — multiple JSON lines are merged so the
        # summary's queries and the detail's spread both land.
        text = open(path).read()
        try:
            d = json.loads(text)
            return d.get("parsed") or d
        except json.JSONDecodeError:
            merged: dict = {}
            for line in text.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        merged.update(json.loads(line))
                    except json.JSONDecodeError:
                        continue
            if "queries" not in merged:
                raise
            return merged

    old = load(args[0])
    new = load(args[1])
    oq, nq = old["queries"], new["queries"]
    spread = new.get("spread", {})
    if not spread:
        print(
            "note: no per-query spread in NEW file (driver artifacts "
            "carry only the summary line) — regression flags are not "
            "noise-gated; diff against bench.py's raw 2-line output "
            "for spread-aware gating"
        )
    shared = sorted(set(oq) & set(nq))
    regressions = []
    print(f"{'query':<28} {'old':>8} {'new':>8} {'delta':>8}  flag")
    for name in shared:
        a, b = oq[name], nq[name]
        delta = (b - a) / a if a else 0.0
        noise = spread.get(name, 0.0)
        flag = ""
        if delta > threshold and delta > noise:
            flag = "REGRESSION"
            regressions.append(name)
        elif delta < -threshold:
            flag = "improved"
        print(f"{name:<28} {a:>7.2f}s {b:>7.2f}s {delta:>+7.0%}  {flag}")
    tot_old = sum(oq[n] for n in shared)
    tot_new = sum(nq[n] for n in shared)
    print(
        f"\nshared-query total: {tot_old:.2f}s -> {tot_new:.2f}s "
        f"({(tot_new - tot_old) / tot_old:+.0%} on {len(shared)} queries)"
    )
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new queries (excluded from total): {', '.join(only_new)}")
    only_old = sorted(set(oq) - set(nq))
    if only_old:
        print(f"removed queries: {', '.join(only_old)}")
    for mode, st in (new.get("streaming_latency") or {}).items():
        if isinstance(st, dict) and "p50_sec" in st:
            print(
                f"streaming {mode}: p50 {st['p50_sec']}s "
                f"p95 {st['p95_sec']}s ({st['n_batches']} batches)"
            )
    if regressions:
        print(f"\n{len(regressions)} regression(s): {', '.join(regressions)}")
        return 1
    print("\nno regressions beyond noise")
    return 0


if __name__ == "__main__":
    sys.exit(main())
