#!/usr/bin/env python3
"""Compare two bench_full.json captures per query (A vs B).

Usage: tools/ab_compare.py A.json B.json [threshold]
Prints queries whose warm differs by more than threshold (default 15%),
plus totals and a geomean. Warm = steady-state min-of-two; cold also shown.
"""
import json, sys, math

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
rows = []
for q in common:
    wa, wb = qa[q]["warm"], qb[q]["warm"]
    if wa <= 0 or wb <= 0:
        continue
    rows.append((q, wa, wb, wb / wa))
gm = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))
wa_t = sum(r[1] for r in rows)
wb_t = sum(r[2] for r in rows)
print(f"n={len(rows)}  warmA={wa_t:.1f}s warmB={wb_t:.1f}s  B/A geomean={gm:.3f}")
print(f"coldA={a['cold_total']:.1f} coldB={b['cold_total']:.1f}  "
      f"contA={a['contended']} contB={b['contended']} "
      f"load1A={a['load1_max']} load1B={b['load1_max']}")
print(f"\n{'query':36} {'A':>7} {'B':>7} {'B/A':>6}")
for q, wa, wb, r in sorted(rows, key=lambda x: x[3]):
    if abs(r - 1) >= thr:
        print(f"{q:36} {wa:7.3f} {wb:7.3f} {r:6.2f}")
