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
    ap.add_argument("--prior-ref", default=None,
                    help="git ref of the prior round's code; flagged queries "
                         "are re-measured on it in a worktree (same host "
                         "moment) — the decisive code-vs-host arbiter")
    args = ap.parse_args()

    # full-board entries only: single-query isolation runs also land in
    # bench_history and must never be mistaken for a board
    hist = [h for h in load_history()
            if args.sf in h.get("sf", "")
            and len(h.get("queries", {})) >= args.min_common]
    if len(hist) < 2:
        print("need two full-board entries in bench_history.jsonl for this sf")
        sys.exit(1)
    cur = hist[-1]
    prior = hist[-2]

    flagged = []
    for q, t in cur["queries"].items():
        p = prior["queries"].get(q)
        if p and p > 0 and t > 0 and t / p > REGRESS_X:
            flagged.append((q, p, t))
    flagged.sort(key=lambda x: -(x[2] / x[1]))
    print(f"{len(flagged)} queries regressed >{REGRESS_X}x in-board "
          f"({cur['at']} vs {prior['at']})")

    # HOST-DRIFT CANARY PAIR (r10 lesson, upgraded r11): the round-10 run
    # proved host throttling is WORKLOAD-SELECTIVE — codegen-tight loops
    # halved while shuffle-bound plans drifted only ~1.1x, so a single
    # canary provably misses it. Re-measure one canary per workload class
    # (codegen-bound pair kernel, shuffle-bound join/agg), both unflagged;
    # the drift factor is the MAX of the two ratios (conservative toward
    # host-drift — the decisive arbiter for "real" stays the prior-code
    # worktree below).
    flagged_names = {q for q, _, _ in flagged}

    def eligible(q):
        p = prior["queries"].get(q, -1)
        # unflagged, non-trivial, and not plausibly IMPROVED by the round
        # (in-board ratio < 0.8 would understate drift)
        return (q not in flagged_names and p and p > 0.2
                and cur["queries"].get(q, -1) > 0
                and cur["queries"][q] / p >= 0.8)

    CANARY_PREFS = {
        "codegen": ["q_lsh_recall", "q_edit_verify", "q_containment",
                    "q_setsim_join"],
        "shuffle": ["q_salted_join", "q5_region_flow", "q_quantiles",
                    "q_market_basket"],
    }
    canaries = {}
    for kind, prefs in CANARY_PREFS.items():
        pick = next((q for q in prefs if eligible(q)), None)
        if pick is None:  # fallback: heaviest eligible prior query
            pick = next((q for q, _ in sorted(prior["queries"].items(),
                                              key=lambda x: -x[1])
                         if eligible(q) and q not in canaries.values()), None)
        if pick:
            canaries[kind] = pick

    drift = 1.0
    canary_report = {}
    for kind, cq in canaries.items():
        cp = prior["queries"][cq]
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=args.sf,
                   SPARK_GRAFT_BENCH_ONLY=cq,
                   SPARK_GRAFT_BENCH_OUT=f"/tmp/bench_iso_{cq}.json")
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=False)
        ct = -1.0
        try:
            iso = json.load(open(f"/tmp/bench_iso_{cq}.json"))
            ct = iso["queries"].get(cq, -1)
            if ct > 0:
                drift = max(drift, ct / cp)
        except (OSError, json.JSONDecodeError):
            pass
        canary_report[kind] = {"query": cq, "prior": cp, "now": ct,
                               "ratio": (ct / cp if ct > 0 else None)}
        print(f"canary[{kind}] {cq}: prior {cp:.2f}s isolated now "
              f"{ct:.2f}s")
    print(f"host drift factor (max over pair): {drift:.2f}")

    # prior-code worktree: the single-canary drift factor is workload-
    # blind (codegen-tight loops throttle differently from shuffle-bound
    # plans — the r10 false-"real" lesson), so when --prior-ref is given,
    # every still-suspect query re-measures on the PRIOR ROUND'S CODE at
    # the same host moment; prior-code-now replaces the history number as
    # the comparison base.
    wt = None
    if args.prior_ref and flagged:
        wt = "/tmp/bench_iso_prior_wt"
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=False)
        r = subprocess.run(["git", "worktree", "add", wt, args.prior_ref],
                           check=False)
        if r.returncode != 0:
            wt = None

    def run_one(q, cwd=None):
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=args.sf,
                   SPARK_GRAFT_BENCH_ONLY=q,
                   SPARK_GRAFT_BENCH_OUT=f"/tmp/bench_iso_{q}.json")
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       cwd=cwd, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL, check=False)
        try:
            return json.load(open(f"/tmp/bench_iso_{q}.json"))["queries"].get(q, -1)
        except (OSError, json.JSONDecodeError, KeyError):
            return -1

    results = {}
    for q, p, t in flagged:
        it = run_one(q)
        base, base_src = p, "history"
        verdict = ("real" if (it > 0 and it / p > REGRESS_X * drift) else
                   ("host-drift" if (it > 0 and it / p > REGRESS_X) else
                    ("noise" if it > 0 else "error")))
        prior_now = None
        if verdict == "real" and wt:
            prior_now = run_one(q, cwd=wt)
            if prior_now and prior_now > 0:
                base, base_src = prior_now, "prior-code-now"
                verdict = ("real" if it / prior_now > REGRESS_X
                           else "host-drift")
        results[q] = {"prior_best": p, "inboard_best": t,
                      "isolated_best": it, "prior_code_now": prior_now,
                      "base": base_src, "verdict": verdict}
        print(f"  {q}: prior {p:.2f}s in-board {t:.2f}s isolated {it:.2f}s"
              + (f" prior-code-now {prior_now:.2f}s" if prior_now else "")
              + f" -> {verdict}")
    if wt:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       check=False)

    out = {"round": args.round, "sf": args.sf, "regress_threshold": REGRESS_X,
           "board_at": cur["at"], "prior_at": prior["at"],
           "host_drift_factor": drift,
           "canaries": canary_report,
           "flagged": results}
    dest = f"bench_iso_r{args.round:02d}.json"
    json.dump(out, open(dest, "w"), indent=1)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
