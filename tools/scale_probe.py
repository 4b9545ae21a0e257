#!/usr/bin/env python3
"""Standing 10x scale probe (driver-side tooling, like check.py).

Runs graft.Bench on the named queries at two scale factors (default
sf0.01 -> sf0.1) and emits one JSON table of wall/shuffle ratios —
the protocol that found q163's single-core gram, q227's per-hop edge
shuffle, q138's LPA co-location bug and the image-dedup lineage
re-decode across rounds 6-7. Run it on every round's new heavy
queries and commit the output as bench_out/scale_rNN.json.

A row is suspicious when wall_ratio or shuffle_ratio substantially
exceeds the data ratio (10x): superlinear members get flagged with
"flag": "superlinear" (ratio > flag_factor * data_ratio, default
1.5x). Wall ratios on a loaded host are noisy — shuffle bytes are the
deterministic adjudicator (byte-stable across runs for a fixed plan).

Usage:
  python3 tools/scale_probe.py [--queries q1,q2,...] [--out FILE]
      [--small DIR] [--big DIR] [--rounds N]
Defaults: the round-8 new heavy set, /root/testdata/sf0.01 ->
/root/testdata/sf0.1, bench_out/scale_latest.json.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

DEFAULT_QUERIES = [
    "q322_model_curation_funnel",
    "q323_psl_domain",
    "q324_zone_table_pip",
    "q325_q13_custdist",
    "q326_calibration_drift_stream",
    "q327_calib_bins_drift",
]


def run_bench(sf_dir, queries, rounds, cpus):
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(queries),
        "SPARK_GRAFT_BENCH_OUT": out,
        "SPARK_GRAFT_ROUNDS": str(rounds),
        "SPARK_GRAFT_CPUS": cpus,
    })
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, timeout=3000)
    if not os.path.exists(out) or os.path.getsize(out) == 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise SystemExit(f"bench produced no output for {sf_dir}")
    with open(out) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_out/scale_latest.json")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--cpus", default="16")
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--flag-factor", type=float, default=1.5)
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    small = run_bench(args.small, queries, args.rounds, args.cpus)
    big = run_bench(args.big, queries, args.rounds, args.cpus)

    def secs(bench, q):
        for sec in ("queries", "extra"):
            v = bench.get(sec, {}).get(q)
            if isinstance(v, (int, float)):
                return float(v)
        return None

    rows = {}
    for q in queries:
        s_w, b_w = secs(small, q), secs(big, q)
        s_m = small.get("exec_metrics", {}).get(q, {})
        b_m = big.get("exec_metrics", {}).get(q, {})
        row = {
            "small_sec": s_w, "big_sec": b_w,
            "small_shuffle_rd": s_m.get("shuffle_rd"),
            "big_shuffle_rd": b_m.get("shuffle_rd"),
            "small_spill": s_m.get("spill"), "big_spill": b_m.get("spill"),
        }
        if s_w and b_w:
            row["wall_ratio"] = round(b_w / s_w, 2)
        if s_m.get("shuffle_rd") and b_m.get("shuffle_rd"):
            row["shuffle_ratio"] = round(
                b_m["shuffle_rd"] / s_m["shuffle_rd"], 2)
        bound = args.flag_factor * args.data_ratio
        if (row.get("shuffle_ratio", 0) or 0) > bound or \
           (row.get("wall_ratio", 0) or 0) > bound:
            row["flag"] = "superlinear"
        rows[q] = row
    result = {
        "protocol": f"{args.small} -> {args.big} "
                    f"(data_ratio {args.data_ratio}x), min-of-{args.rounds}, "
                    f"cpus {args.cpus}",
        "load": {"small_before": small.get("load_before"),
                 "small_after": small.get("load_after"),
                 "big_before": big.get("load_before"),
                 "big_after": big.get("load_after")},
        "queries": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    flagged = [q for q, r in rows.items() if r.get("flag")]
    if flagged:
        print(f"SUPERLINEAR: {','.join(flagged)}", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
