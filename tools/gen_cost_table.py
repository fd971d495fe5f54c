#!/usr/bin/env python3
"""Regenerate Bench.priorCostCs from a bench run's JSON.

The cost table drives Bench's cost-aware warm order; hand-maintaining
it decays silently as queries are added or change cost. This script
emits the Scala array literal from an actual run, so the closing
ritual is mechanical:

    python3 tools/gen_cost_table.py BENCH.json            # print literal
    python3 tools/gen_cost_table.py BENCH.json --apply    # patch Bench.scala

Accepts either the raw Bench stdout tail (the one-line JSON with
"queries_cs" or "queries") or the driver's BENCH_r{N}.json wrapper
(reads its "parsed" field). Missing query numbers (gaps, failed lines)
emit -1, which costOf treats as cheap — the warm order only needs
relative magnitudes.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries_cs" in d:
        return [int(v) for v in d["queries_cs"]]
    qs = d["queries"]
    # keys are either bare numbers ("182"), "qNN", or full names
    by_num = {}
    for k, v in qs.items():
        m = re.match(r"q?(\d+)", k)
        if m:
            cs = int(round(float(v) * 100)) if d.get("q_unit") != "cs" else int(v)
            by_num[int(m.group(1))] = cs
    n = max(by_num)
    return [by_num.get(i, -1) for i in range(1, n + 1)]


def literal(cs, width=73):
    body = ",".join(str(v) for v in cs)
    lines, cur = [], ""
    for tok in body.split(","):
        nxt = (cur + "," if cur else "") + tok
        if len(nxt) > width:
            lines.append(cur + ",")
            cur = tok
        else:
            cur = nxt
    lines.append(cur)
    pad = "    "
    return "Array(\n" + "\n".join(pad + ln for ln in lines) + ")"


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cs = load(sys.argv[1])
    lit = literal(cs)
    print(f"// {len(cs)} entries from {sys.argv[1]}")
    print(f"  val priorCostCs: Array[Int] = {lit}")
    if "--apply" in sys.argv:
        path = "src/main/scala/graft/Bench.scala"
        with open(path) as f:
            src = f.read()
        new, n = re.subn(
            r"val priorCostCs: Array\[Int\] = Array\([\s\S]*?\)\n",
            f"val priorCostCs: Array[Int] = {lit}\n",
            src, count=1)
        if n != 1:
            sys.exit("could not locate priorCostCs literal in Bench.scala")
        with open(path, "w") as f:
            f.write(new)
        print(f"patched {path} ({len(cs)} entries)")


if __name__ == "__main__":
    main()
