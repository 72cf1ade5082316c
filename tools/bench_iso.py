#!/usr/bin/env python3
"""Automatic isolation re-measure (VERDICT r9 task 6, made standard).

Compares the newest full-board bench entry in bench_history.jsonl against
the newest PRIOR entry that shares >= `--min-common` queries, flags every
query whose in-board best regressed more than REGRESS_X, and re-runs each
flagged query in its own JVM via SPARK_GRAFT_BENCH_ONLY (best-of-3).
Writes bench_iso_r{N}.json with, per flagged query: the prior best, the
in-board best, the isolated best, and a noise-vs-real adjudication
(real = isolated best still regresses > REGRESS_X).

Usage: python3 tools/bench_iso.py --round 10 [--sf /root/testdata/sf0.1]
"""
import argparse
import json
import os
import subprocess
import sys

REGRESS_X = 1.5


def load_history(path="bench_history.jsonl"):
    out = []
    for line in open(path):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("harness") == "died":
            continue
        if "queries" in d:
            out.append(d)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--min-common", type=int, default=150)
    args = ap.parse_args()

    hist = [h for h in load_history() if args.sf in h.get("sf", "")]
    if len(hist) < 2:
        print("need two board entries in bench_history.jsonl for this sf")
        sys.exit(1)
    cur = hist[-1]
    prior = None
    for h in reversed(hist[:-1]):
        common = set(h["queries"]) & set(cur["queries"])
        if len(common) >= args.min_common:
            prior = h
            break
    if prior is None:
        print("no prior board entry shares enough queries")
        sys.exit(1)

    flagged = []
    for q, t in cur["queries"].items():
        p = prior["queries"].get(q)
        if p and p > 0 and t > 0 and t / p > REGRESS_X:
            flagged.append((q, p, t))
    flagged.sort(key=lambda x: -(x[2] / x[1]))
    print(f"{len(flagged)} queries regressed >{REGRESS_X}x in-board "
          f"({cur['at']} vs {prior['at']})")

    results = {}
    for q, p, t in flagged:
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=args.sf,
                   SPARK_GRAFT_BENCH_ONLY=q,
                   SPARK_GRAFT_BENCH_OUT=f"/tmp/bench_iso_{q}.json")
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=False)
        try:
            iso = json.load(open(f"/tmp/bench_iso_{q}.json"))
            it = iso["queries"].get(q, -1)
        except (OSError, json.JSONDecodeError):
            it = -1
        verdict = "real" if (it > 0 and it / p > REGRESS_X) else (
            "noise" if it > 0 else "error")
        results[q] = {"prior_best": p, "inboard_best": t,
                      "isolated_best": it, "verdict": verdict}
        print(f"  {q}: prior {p:.2f}s in-board {t:.2f}s "
              f"isolated {it:.2f}s -> {verdict}")

    out = {"round": args.round, "sf": args.sf, "regress_threshold": REGRESS_X,
           "board_at": cur["at"], "prior_at": prior["at"],
           "flagged": results}
    dest = f"bench_iso_r{args.round:02d}.json"
    json.dump(out, open(dest, "w"), indent=1)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
