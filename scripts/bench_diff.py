#!/usr/bin/env python3
"""Compare two bench result files (bench_details.json format, or a
driver BENCH_r{N}.json whose `tail`/`parsed` contains the JSON line).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [threshold]

Prints per-query deltas sorted by regression size; exit 1 if any query
regressed by more than `threshold` (default 1.5x AND >0.3s absolute —
shared-host noise swings small queries far more than 1.5x).
"""
import json, re, sys


def load(path):
    raw = json.load(open(path))
    if "queries" in raw:
        return raw["queries"]
    if raw.get("parsed"):
        return raw["parsed"]["queries"]
    # driver tail capture — possibly FRONT-TRUNCATED (rounds 1-5 were):
    # scrape every "name":float pair and drop the meta keys
    pairs = re.findall(r'"([a-z0-9_]+)":(-?[0-9.]+)', raw.get("tail", ""))
    if not pairs:
        sys.exit(f"{path}: no parseable queries map")
    meta = {"metric", "value", "reps", "n_queries", "sf", "n", "rc", "cpus"}
    return {k: float(v) for k, v in pairs if k not in meta}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    rows = [(new[q] / old[q] if old[q] > 0 else float("inf"),
             old[q], new[q], q) for q in common]
    rows.sort(reverse=True)
    regressions = []
    print(f"{'ratio':>7} {'old':>7} {'new':>7}  query")
    for ratio, o, n, q in rows:
        flag = ""
        if ratio > threshold and n - o > 0.3:
            flag = "  <-- REGRESSION"
            regressions.append(q)
        print(f"{ratio:7.2f} {o:7.2f} {n:7.2f}  {q}{flag}")
    only_old = set(old) - set(new)
    only_new = set(new) - set(old)
    if only_old:
        print("dropped:", ", ".join(sorted(only_old)))
    if only_new:
        print("added:", ", ".join(sorted(only_new)))
    print(f"\ntotal: {sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s over {len(common)} common queries")
    if regressions:
        sys.exit(f"regressed: {', '.join(regressions)}")


if __name__ == "__main__":
    main()
