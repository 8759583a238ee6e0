#!/usr/bin/env python3
"""Regression tripwire: diff a bench JSON against BASELINE.md's
spark_sec pins and fail loudly on per-query regressions.

Usage:
  python3 tools/benchdiff.py [bench.json] [--ratio 1.5] [--floor auto]

Defaults to target/bench.json (the full map graft.Bench writes).
A query REGRESSES when
    (bench_sec - floor) > ratio * (pin_sec - pin_floor)
with a 0.15 s absolute slack so sub-floor rows can't trip on
scheduling jitter — the same net-of-floor discipline BASELINE.md's
prose prescribes (min-of-runs, floor measured per session).

Exit code 1 if any regression; prints a sorted table either way.
New queries (no pin) and pinned queries missing from the bench run
are listed informationally, never fatally — the driver's bench and a
SPARK_GRAFT_ONLY subset run both feed this tool.

The r12 lesson this automates: ann_opq_topk's pin was min-merged
across two different IMPLEMENTATIONS (in-memory vs lake-served),
hiding the lake tier's real cost until hand-audited; and
bronze_partition_upsert read 2.3x its pin on a single noisy pass.
Machinery beats vigilance: run this after every bench, re-measure
min-of-3 before believing any listed regression, and re-pin
BASELINE.md (tools/baseline.py) only after adjudicating the cause.
"""
import json, re, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
bench_path = args[0] if args else "target/bench.json"

def opt(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return a.split("=", 1)[1]
    return default

RATIO = float(opt("ratio", "1.5"))
SLACK = float(opt("slack", "0.15"))

bench = json.load(open(bench_path))
bqueries = bench.get("queries", {})
bfloor = float(bench.get("floor_sec", 0.0))
if str(opt("floor", "auto")) != "auto":
    bfloor = float(opt("floor", "0"))

# parse BASELINE.md pins: | name | duckdb | spark | rows |
pins = {}
pin_floor = 0.185  # BASELINE.md's merged-session floor pin
for line in open("BASELINE.md"):
    m = re.match(r"\|\s*([a-z0-9_]+)\s*\|\s*([\d.]+)\s*\|"
                 r"\s*([\d.]+)\s*\|", line)
    if m and m.group(1) != "query":
        pins[m.group(1)] = float(m.group(3))
# Anchored to the labeled pin line ("Spark bench machine state:
# floor X s") — a bare "floor X s" match anywhere in the prose would
# silently shift every net-of-floor comparison (ADVICE r13).
m = re.search(r"Spark bench machine state: floor ([\d.]+) s",
              open("BASELINE.md").read())
if m:
    pin_floor = float(m.group(1))

# ---- scaling-tier pins (r15, verdict #4) ----------------------------
# The sf10 and ov tiers ran unpinned at ±30% session variance — the
# exact way the sf0.1 tier drifted before r13 mechanized it. They pin
# in BASELINE.md as single-numeric-column tables ("| name | sec |",
# which the two-numeric main-pin regex above cannot match) under
# "## sf10 tier pins" / "## ov tier pins". One timed pass per row and
# no warmup means wider honest variance than the min-of-2 sf0.1 rows:
# the gate is ratio 1.8 + 0.5 s slack, no floor arithmetic (every row
# is multi-second).
TIER_RATIO = float(opt("tier-ratio", "1.8"))
TIER_SLACK = float(opt("tier-slack", "0.5"))
TIERS = ("sf1", "sf10", "ov", "vec")
tier_pins = {t: {} for t in TIERS}
cur_tier = None
for line in open("BASELINE.md"):
    for t in TIERS:
        if line.startswith(f"## {t} tier pins"):
            cur_tier = t
            break
    else:
        if line.startswith("## "):
            cur_tier = None
    m2 = re.match(r"\|\s*([a-z0-9_:]+)\s*\|\s*([\d.]+)\s*\|\s*$", line)
    if cur_tier and m2 and m2.group(1) != "query":
        tier_pins[cur_tier][m2.group(1)] = float(m2.group(2))

# A pinned tier that is ABSENT from the bench run is a failure unless
# the run marked the skip intentional ("only-subset run" — local
# iteration; the driver always runs full). r15 lesson: sf1's dir was
# deleted and the tier silently vanished from three artifacts with
# benchdiff still exiting 0.
tier_regressions, tier_notes, tier_absent = [], [], []
for tier in TIERS:
    tblock = bench.get(tier) or {}
    tqueries = tblock.get("queries", {})
    pinned = tier_pins[tier]
    skipped = tblock.get("skipped")
    if pinned and not tqueries:
        if skipped == "only-subset run":
            tier_notes.append(f"{tier}: skipped ({skipped})")
        else:
            tier_absent.append(
                f"{tier}: {len(pinned)} pins but tier "
                + (f"skipped ({skipped})" if skipped else
                   "absent from bench run (no skip marker — "
                   "pre-marker binary?)"))
        continue
    for name, sec in sorted(tqueries.items()):
        if sec < 0:
            continue
        if name not in pinned:
            tier_notes.append(f"{tier}:{name} {sec:.2f}s (no pin)")
            continue
        if sec > TIER_RATIO * pinned[name] + TIER_SLACK:
            tier_regressions.append((tier, name, sec, pinned[name]))
    for name in sorted(set(pinned) - set(tqueries)):
        if tqueries:
            tier_notes.append(f"{tier}:{name} pinned but not benched")

regressions, improved, nopin = [], [], []
for name, sec in sorted(bqueries.items()):
    if sec < 0:
        continue  # errored queries are the gate's job, not ours
    if name not in pins:
        nopin.append((name, sec))
        continue
    pin = pins[name]
    net, pin_net = max(sec - bfloor, 0.0), max(pin - pin_floor, 0.0)
    if net > RATIO * pin_net + SLACK:
        regressions.append((name, sec, pin, net, pin_net))
    elif pin_net > RATIO * net + SLACK:
        improved.append((name, sec, pin))

if bench.get("noisy"):
    print(f"WARN: bench marked noisy (floor {bfloor:.3f}s) — "
          "re-measure on a quiet machine before trusting regressions")
print(f"floor: bench {bfloor:.3f}s vs pin {pin_floor:.3f}s; "
      f"ratio gate {RATIO}x net-of-floor + {SLACK}s slack")
if regressions:
    print(f"\nREGRESSIONS ({len(regressions)}):")
    for n, s, p, net, pn in sorted(regressions, key=lambda r: -r[3]):
        print(f"  {n}: {s:.3f}s vs pin {p:.3f}s "
              f"(net {net:.3f} vs {pn:.3f})")
if improved:
    print(f"\nimproved past the same gate ({len(improved)}): "
          + ", ".join(f"{n} {s:.3f}<{p:.3f}" for n, s, p in improved))
if nopin:
    print(f"\nno pin ({len(nopin)}): "
          + ", ".join(f"{n} {s:.3f}" for n, s in sorted(nopin)))
missing = sorted(set(pins) - set(bqueries))
if missing and len(bqueries) > len(pins) / 2:
    print(f"\npinned but not benched ({len(missing)}): "
          + ", ".join(missing))
if tier_regressions:
    print(f"\nTIER REGRESSIONS ({len(tier_regressions)}) over "
          f"{TIER_RATIO}x + {TIER_SLACK}s:")
    for t, n, s, p in tier_regressions:
        print(f"  {t}:{n}: {s:.2f}s vs pin {p:.2f}s")
if tier_absent:
    print(f"\nTIER ABSENT ({len(tier_absent)}):")
    for t in tier_absent:
        print(f"  {t}")
if tier_notes:
    print(f"\ntier notes: " + "; ".join(tier_notes))
n_tier_pins = sum(len(v) for v in tier_pins.values())
all_reg = regressions or tier_regressions or tier_absent
print(f"\n{'FAIL' if all_reg else 'ok'}: "
      f"{len(regressions)} regression(s) over {RATIO}x gate, "
      f"{len(tier_regressions)} tier regression(s), "
      f"{len(tier_absent)} pinned tier(s) absent "
      f"({sum(1 for _ in bqueries)} benched, {len(pins)} pinned, "
      f"{n_tier_pins} tier-pinned)")
sys.exit(1 if all_reg else 0)
