#!/usr/bin/env python3
"""Round-over-round bench regression triage (VERDICT r7 #6).

Diffs two bench artifacts and emits the >RATIO_FLOOR list so no round
ships a driver artifact with unexplained multiples: every flagged key
must end up either explained (controls inflated too -> host noise) or
fixed, recorded in SCALE.md.

Accepts BOTH artifact shapes:
  - driver BENCH_r{N}.json: {"n","rc","cpus","sf","tail","parsed"} --
    per-query map parsed from "parsed" or, when that is null (the tail
    lost its opening brace), re-extracted from the "tail" text;
  - raw bench line / target/bench.json: {"metric","value","queries",...}.

Usage:
  scripts/benchdiff.py OLD.json NEW.json [--append-scale]

Exit 0 always (triage tool, not a correctness gate): bench multiples
need human attribution -- the r5-r8 record shows most are co-tenant
noise, and a red exit here would train people to override the gate.
--append-scale appends the markdown table to SCALE.md under a dated
heading when anything is flagged.
"""
import json
import re
import subprocess
import sys

RATIO_FLOOR = 1.5
# known-cheap queries whose inflation indicates HOST noise, not a plan
# regression -- rendered alongside flagged rows for attribution
CONTROLS = ("q_topk", "q_pivot", "q_filter_conj", "q_scan_limit")


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:  # raw bench line / target/bench.json
        return d["queries"], float(d.get("value", 0.0))
    parsed = d.get("parsed")
    if not parsed:  # driver artifact whose tail lost the opening brace
        m = re.findall(r'\{"metric":.*?"sf":"[^"]*"\}', d.get("tail", ""))
        if not m:
            sys.exit(f"benchdiff: no bench line recoverable from {path}")
        parsed = json.loads(m[-1])
    return parsed["queries"], float(parsed.get("value", 0.0))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    append = "--append-scale" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old_q, old_total = load_queries(args[0])
    new_q, new_total = load_queries(args[1])
    common = sorted(set(old_q) & set(new_q))
    flagged = []
    for k in common:
        if old_q[k] > 0 and new_q[k] / old_q[k] > RATIO_FLOOR:
            flagged.append((new_q[k] / old_q[k], k, old_q[k], new_q[k]))
    flagged.sort(reverse=True)

    lines = [
        f"benchdiff {args[0]} -> {args[1]}: "
        f"{len(common)} common keys, total {old_total:.1f}s -> {new_total:.1f}s, "
        f"{len(flagged)} over {RATIO_FLOOR}x"
    ]
    if flagged:
        lines.append("")
        lines.append("| query | old s | new s | ratio |")
        lines.append("|---|---|---|---|")
        for ratio, k, o, n in flagged:
            lines.append(f"| `{k}` | {o:.3f} | {n:.3f} | {ratio:.1f}x |")
        lines.append("")
        ctl = [
            f"`{c}` {old_q[c]:.3f}->{new_q[c]:.3f}"
            for c in CONTROLS if c in old_q and c in new_q
        ]
        lines.append(
            "Controls (cheap fixed plans -- if these inflated too, "
            "suspect the host): " + ", ".join(ctl))
        lines.append(
            "Every flagged key needs an IsolatedBench min-of-3 triage "
            "entry in SCALE.md (noise vs cause+fix).")
    out = "\n".join(lines)
    print(out)
    if append and flagged:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
        with open("SCALE.md", "a") as f:
            f.write(f"\n## benchdiff flags (HEAD={head})\n\n{out}\n")
        print("benchdiff: appended flagged table to SCALE.md")


if __name__ == "__main__":
    main()
