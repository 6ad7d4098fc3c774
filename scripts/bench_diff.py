#!/usr/bin/env python3
"""Compare two bench result files (bench_details.json format, or a
driver BENCH_r{N}.json whose `tail`/`parsed` contains the JSON line).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [threshold]

Prints per-query deltas sorted by regression size; exit 1 if any query
regressed by more than `threshold` (default 1.5x AND >0.3s absolute —
shared-host noise swings small queries far more than 1.5x).

Deltas are HOST-NORMALIZED before flagging (round-14 directive): the
fixed 10-query calibration subset's code never changes round over
round, so its total moves only with host conditions — each ratio is
divided by (calNew / calOld) and the absolute delta is computed on the
host-adjusted new time. Identical code swung -15% (r11->r12) and +27%
(r12->r13) on host noise alone; normalization makes those pairs diff
clean without manual adjudication. The calibration total comes from
the file's quiesced re-timed block (`calibration.total` /
`parsed.cal`) when present, else from summing the subset's in-run
best times (pre-r13 files); if neither side yields one, factor = 1.
"""
import json, re, sys

# the FIXED calibration subset — must mirror Bench.scala `calibration`
# (Bench asserts the registry contains all ten at startup)
# cal_version 2 (r20): agg_tpcds_q78 left the probe (it became an
# optimization target); agg_tpcds_q93 replaced it. Files of different
# cal_version have incomparable quiesced totals -- host_factor falls
# back to the members common to BOTH versions, whose code is unchanged.
CAL_QUERIES = [
    "agg_tpch_q1", "agg_tpch_q6", "join_multiway", "window_running",
    "dedup_minhash_pairs", "vec_cosine_topk", "text_stats",
    "agg_tpcds_q93", "pattern_match", "agg_approx_quantiles",
]
# v1 probe (pre-r20), kept for cross-version fallback intersection
CAL_QUERIES_V1 = [q if q != "agg_tpcds_q93" else "agg_tpcds_q78"
                  for q in CAL_QUERIES]


def load(path):
    raw = json.load(open(path))
    queries = cal = None
    ver = 1
    if "queries" in raw:
        queries = raw["queries"]
        cal = raw.get("calibration", {}).get("total")
        ver = raw.get("calibration", {}).get("cal_version", 1)
    elif raw.get("parsed"):
        queries = raw["parsed"]["queries"]
        cal = raw["parsed"].get("cal")
        ver = raw["parsed"].get("cal_version", 1)
    else:
        # driver tail capture — possibly FRONT-TRUNCATED (rounds 1-5
        # were): scrape every "name":float pair, drop the meta keys
        pairs = re.findall(r'"([a-z0-9_]+)":(-?[0-9.]+)', raw.get("tail", ""))
        if not pairs:
            sys.exit(f"{path}: no parseable queries map")
        meta = {"metric", "value", "reps", "n_queries", "sf", "n", "rc",
                "cpus", "cal"}
        queries = {k: float(v) for k, v in pairs if k not in meta}
        m = re.search(r'"cal_version":(\d+)', raw.get("tail", ""))
        if m:
            ver = int(m.group(1))
    return queries, cal, ver


def host_factor(old, cal_old, new, cal_new, ver_old=1, ver_new=1):
    if ver_old != ver_new:
        # quiesced totals span different probe sets: normalize with the
        # in-run times of the members common to both versions instead
        print(f"cal_version {ver_old} vs {ver_new}: quiesced totals not "
              "comparable, using common fixed-code members")
        cal_old = cal_new = None
    # Bench publishes total = -1.0 when any probe member failed every
    # rep — a poisoned denominator must fall back, not normalize
    if cal_old is not None and cal_old <= 0:
        cal_old = None
    if cal_new is not None and cal_new <= 0:
        cal_new = None
    if cal_old and cal_new:
        print(f"host factor (calNew/calOld): {cal_new / cal_old:.3f} "
              f"({cal_old:.2f}s -> {cal_new:.2f}s, quiesced cal blocks)")
        return cal_new / cal_old
    # pre-r13 files carry no quiesced cal block and their compact
    # stdout map may be truncated: fall back to the calibration-subset
    # members present in BOTH in-run maps (still fixed-code queries,
    # just timed inside the interleaved pass instead of quiesced)
    both = [q for q in set(CAL_QUERIES) & set(CAL_QUERIES_V1)
            if old.get(q, 0) > 0 and new.get(q, 0) > 0]
    if len(both) >= 3:
        co, cn = sum(old[q] for q in both), sum(new[q] for q in both)
        print(f"host factor (in-run cal subset, {len(both)}/10 common): "
              f"{cn / co:.3f} ({co:.2f}s -> {cn:.2f}s)")
        return cn / co
    print("WARNING: no calibration overlap — deltas NOT host-normalized")
    return 1.0


def main():
    (old, cal_old, ver_old) = load(sys.argv[1])
    (new, cal_new, ver_new) = load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    factor = host_factor(old, cal_old, new, cal_new, ver_old, ver_new)
    common = sorted(set(old) & set(new))
    rows = [(new[q] / old[q] / factor if old[q] > 0 else float("inf"),
             old[q], new[q], q) for q in common]
    rows.sort(reverse=True)
    regressions = []
    print(f"{'normed':>7} {'old':>7} {'new':>7}  query")
    for ratio, o, n, q in rows:
        flag = ""
        if ratio > threshold and n / factor - o > 0.3:
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
          f"{sum(new[q] for q in common):.1f}s over {len(common)} common "
          f"queries (host-normalized: "
          f"{sum(new[q] for q in common) / factor:.1f}s)")
    if regressions:
        sys.exit(f"regressed: {', '.join(regressions)}")


if __name__ == "__main__":
    main()
