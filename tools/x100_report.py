#!/usr/bin/env python3
"""Render the full-registry x100 certification table from Probe logs.

Input: six Probe logs (x10/x100 for the plain, tag-docs, and prefix-docs
corpora — see SCALE.md for why each family needs its corpus variant),
each containing lines of the form

  PROBE <query>: <t> s  [shuffleWrite <g> GB, spill mem <m> GB / disk <d> GB]

Output: a per-family markdown table with measured wall-clock and
shuffle-write bytes at both decades and the shuffle decade ratio — the
superlinearity adjudication column: shuffle-write is the algorithmic
work, load-independent on a busy VM (wall-clock is not), and linear
scaling shows as ~10x per decade. Queries whose shuffle is ~0 at both
decades are map-only or bounded-aggregate shapes (flagged 'map/bounded').

Usage: python3 tools/x100_report.py
  (expects /tmp/probe_{x10,x100}_{plain,tag,dd}.log)
"""
import re
import sys
from collections import defaultdict

LINE = re.compile(
    r"^PROBE (\S+): ([\d.]+) s\s+\[shuffleWrite ([\d.]+) GB, "
    r"spill mem ([\d.]+) GB / disk ([\d.]+) GB\]")

FAMILIES = [
    ("S scan/sink/layout", lambda q: q.startswith("s") and q[1].isdigit()),
    ("P parse", lambda q: (q.startswith("p") and q[1].isdigit()) or q == "p_parse_ssh_roundtrip"),
    ("D derive/clean", lambda q: q.startswith("d") and q[1].isdigit()),
    ("A aggregate/analytics", lambda q: q.startswith("a") and q[1].isdigit()),
    ("J joins", lambda q: q.startswith("j") and q[1].isdigit()),
    ("T top-k", lambda q: q.startswith("t") and q[1].isdigit()),
    ("W windows", lambda q: q.startswith("w") and q[1].isdigit()),
    ("G grouping/graph", lambda q: q.startswith("g") and q[1].isdigit()),
    ("set ops", lambda q: q.startswith("set_")),
    ("st streaming twins", lambda q: q.startswith("st")),
    ("dd dedup (x100p)", lambda q: q.startswith("dd_")),
    ("sim similarity/ANN", lambda q: q.startswith("sim_")),
    ("tx text/LLM (x100t)", lambda q: q.startswith("tx_")),
    ("ir retrieval (x100t)", lambda q: q.startswith("ir_")),
    ("mm multimodal", lambda q: q.startswith("mm_")),
    ("pipe composed", lambda q: q.startswith("pipe_")),
]


def parse(path):
    out = {}
    try:
        for ln in open(path):
            m = LINE.match(ln)
            if m:
                out[m.group(1)] = tuple(float(m.group(i)) for i in range(2, 6))
    except FileNotFoundError:
        print(f"missing {path}", file=sys.stderr)
    return out


def main():
    x10, x100 = {}, {}
    for variant in ("plain", "tag", "dd"):
        x10.update(parse(f"/tmp/probe_x10_{variant}.log"))
        x100.update(parse(f"/tmp/probe_x100_{variant}.log"))
    fam_members = defaultdict(list)
    for q in sorted(set(x10) | set(x100)):
        for name, pred in FAMILIES:
            if pred(q):
                fam_members[name].append(q)
                break
        else:
            fam_members["UNCLASSIFIED"].append(q)

    print("| family | n | x100 wall (s) | shuffle x10 → x100 (GB) | shuffle ratio | map/bounded | flips | max per-query ratio |")
    print("|---|---|---|---|---|---|---|---|")
    worst = []
    for name, _ in FAMILIES:
        qs = fam_members.get(name, [])
        if not qs:
            continue
        wall = sum(x100[q][0] for q in qs if q in x100)
        s10 = sum(x10[q][1] for q in qs if q in x10)
        s100 = sum(x100[q][1] for q in qs if q in x100)
        # Ratio floor: a query shuffling <20 MB at x10 has no meaningful
        # denominator — when it shuffles real bytes at x100 that is the
        # broadcast→shuffle THRESHOLD FLIP (AQE demoting a no-longer-small
        # side), the designed degrade path, not superlinear work. Those
        # are listed as 'flips' instead of polluting the ratio.
        ratios = {}
        nzero = 0
        flips = []
        for q in qs:
            a = x10.get(q, (0, 0, 0, 0))[1]
            b = x100.get(q, (0, 0, 0, 0))[1]
            if a >= 0.02:
                ratios[q] = b / a
            elif b >= 0.05:
                flips.append(q)
            else:
                nzero += 1
        rs10 = sum(x10[q][1] for q in ratios)
        rs100 = sum(x100[q][1] for q in ratios)
        fam_ratio = f"{rs100 / rs10:.1f}x" if rs10 >= 0.02 else "—"
        if ratios:
            mq = max(ratios, key=ratios.get)
            mx = f"{ratios[mq]:.1f}x ({mq})"
            worst.append((ratios[mq], mq))
        else:
            mx = "—"
        print(f"| {name} | {len(qs)} | {wall:.1f} | {s10:.2f} → {s100:.2f} | "
              f"{fam_ratio} | {nzero}/{len(qs)} | {len(flips)} | {mx} |")
        for q in flips:
            print(f"  FLIP {name}: {q} {x10.get(q,(0,0))[1]:.2f} -> "
                  f"{x100.get(q,(0,0))[1]:.2f} GB (threshold-flip candidate — "
                  f"verify the final plan demoted a broadcast, then it's the designed degrade)")
    print()
    worst.sort(reverse=True)
    for r, q in worst[:8]:
        a, b = x10[q][1], x100[q][1]
        print(f"  superlinearity check {q}: {a:.2f} -> {b:.2f} GB = {r:.1f}x"
              f"{'  <-- ABOVE 12x, investigate' if r > 12 else ''}")
    missing10 = sorted(set(x100) - set(x10))
    missing100 = sorted(set(x10) - set(x100))
    if missing10:
        print(f"  missing at x10: {', '.join(missing10)}")
    if missing100:
        print(f"  missing at x100: {', '.join(missing100)}")


if __name__ == "__main__":
    main()
