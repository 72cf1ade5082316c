#!/usr/bin/env python3
"""Merge per-shard Bench JSON artifacts into one board-wide artifact."""
import json, sys

outs = sys.argv[1:-1]
dest = sys.argv[-1]
queries, spread, errors, adjudication = {}, {}, {}, {}
reps, sf, adj_hist, adj_spread = None, None, None, None
hist_ratios = []
for p in outs:
    d = json.load(open(p))
    if d.get("harness") == "died":
        print(f"shard {p} harness died at {d.get('last_query')}", file=sys.stderr)
        sys.exit(2)
    queries.update(d["queries"]); spread.update(d.get("spread", {}))
    errors.update(d.get("errors", {})); reps = d["reps"]; sf = d["sf"]
    adjudication.update(d.get("adjudication", {}))
    adj_hist = d.get("adj_hist", adj_hist)
    adj_spread = d.get("adj_spread", adj_spread)
    if "hist_ratio" in d:
        hist_ratios.append(d["hist_ratio"])
total = sum(v for v in queries.values() if v > 0)
merged = {"metric": "total", "value": total, "unit": "sec",
          "queries": queries, "spread": spread, "reps": reps,
          "adj_hist": adj_hist, "adj_spread": adj_spread,
          "hist_ratio": max(hist_ratios) if hist_ratios else None,
          "adjudication": adjudication,
          "errors": errors, "n_errors": len(errors),
          "n_queries": len(queries), "sf": sf, "shards": len(outs)}
json.dump(merged, open(dest, "w"))
print(f"total {total:.1f}s over {len(queries)} queries, {len(errors)} errors")
