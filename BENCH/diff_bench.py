"""Per-query regression diff between two bench JSON artifacts.

    python BENCH/diff_bench.py OLD.json NEW.json [--pct 25] [--floor 0.15]

Compares the "queries" dicts of two bench.py outputs (e.g. a committed
BENCH_r{N}.json vs BENCH/last_bench.json) and prints queries whose wall
time moved more than --pct percent in either direction, ignoring queries
faster than --floor seconds in BOTH runs (pure scheduling noise).  Exits
non-zero when regressions exist so it can gate a scripted check.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=25.0)
    ap.add_argument("--floor", type=float, default=0.15)
    a = ap.parse_args()
    with open(a.old) as f:
        old = json.load(f)
    with open(a.new) as f:
        new = json.load(f)
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    if not isinstance(qo, dict) or "n_queries" in qo:
        raise SystemExit(f"{a.old}: no per-query dict (compact line? use BENCH/last_bench.json)")
    reg, imp = [], []
    for k in sorted(set(qo) & set(qn)):
        o, n = qo[k], qn[k]
        if max(o, n) < a.floor or o <= 0:
            continue
        delta = (n - o) / o * 100
        (reg if delta > a.pct else imp if delta < -a.pct else []).append((k, o, n, delta))
    for label, rows in (("regressed", reg), ("improved", imp)):
        for k, o, n, d in sorted(rows, key=lambda r: -abs(r[3])):
            print(f"{label}: {k}  {o:.3f}s -> {n:.3f}s  ({d:+.0f}%)")
    ho, hn = old.get("headline") or {}, new.get("headline") or {}
    for m in ("enc_bytes", "ratio", "encode_MiBps", "decode_MiBps"):
        if m in ho and m in hn:
            print(f"headline {m}: {ho[m]} -> {hn[m]}")
    print(f"common queries: {len(set(qo) & set(qn))}; only-old: {len(set(qo)-set(qn))}; "
          f"only-new: {len(set(qn)-set(qo))}; regressions: {len(reg)}")
    return 1 if reg else 0


if __name__ == "__main__":
    sys.exit(main())
