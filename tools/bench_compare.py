#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and flag queries whose
wall-time ratio exceeds the data-scale ratio by a margin — the signature of
super-linear (skew/quadratic) behavior.

Usage: python3 tools/bench_compare.py <small.json> <big.json> [scale=10] [slack=1.5]
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
    limit = scale * slack
    rows = []
    for q, t_small in sorted(small["queries"].items()):
        t_big = big["queries"].get(q)
        if t_big is None:
            print(f"MISSING {q} in big run")
            continue
        # sub-second baselines are dominated by fixed per-query overhead;
        # use a floor so tiny denominators don't fake super-linearity
        ratio = t_big / max(t_small, 0.5)
        rows.append((ratio, q, t_small, t_big))
    bad = 0
    for ratio, q, t_small, t_big in sorted(rows, reverse=True):
        flag = "SUPER-LINEAR" if ratio > limit else "ok"
        if ratio > limit:
            bad += 1
        print(f"{q:28s} {t_small:8.2f}s -> {t_big:8.2f}s  x{ratio:5.1f}  {flag}")
    print(f"\ntotal {small['value']:.1f}s -> {big['value']:.1f}s "
          f"(x{big['value'] / small['value']:.1f} at {scale:g}x data); "
          f"{bad} super-linear (> x{limit:g})")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
