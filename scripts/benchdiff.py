#!/usr/bin/env python3
"""Round-over-round bench regression triage (VERDICT r7 #6, r10 #7).

Diffs two bench artifacts and emits the >RATIO_FLOOR list so no round
ships a driver artifact with unexplained multiples: every flagged key
must end up either explained (controls inflated too -> host noise) or
fixed, recorded in SCALE.md.

Two distinct regression SIGNATURES (VERDICT r10 #7 -- the r10 closing
artifact had flat controls with a localized >2x family and shipped
untriaged because only the controls-inflated signature was named):

  host-noise-suspect -- the cheap fixed-plan controls inflated along
    with everything else: the host was busy; re-measure before
    believing anything.
  suspect-real -- controls FLAT (median ratio <= CONTROL_FLAT) while
    one or more keys exceed HARD_RATIO: the inflation is localized to
    real plans, so it is a plan or suite-hygiene regression until an
    IsolatedBench fresh-JVM triage proves otherwise. With --gate,
    every such key MUST have a "triage:" line naming it in SCALE.md or
    the exit code goes non-zero (presnapshot folds that into the gate).

Accepts BOTH artifact shapes:
  - driver BENCH_r{N}.json: {"n","rc","cpus","sf","tail","parsed"} --
    per-query map parsed from "parsed" or, when that is null (the tail
    lost its opening brace), re-extracted from the "tail" text;
  - raw bench line / target/bench.json: {"metric","value","queries",...}.

Position-aware attribution (round 17): bench artifacts now carry
"ctrl_cs" rows -- the four fixed-plan controls re-timed every ~50
suite positions ([position, centiseconds...]). A suspect-real key
whose NEAREST control row reads >= HOT_POSITION x its own suite
minimum ran at a provably hot moment: it is attributed to transient
host/session pressure (printed, but exempt from the triage-line
requirement). Keys at cold positions still gate. Artifacts without
ctrl_cs (pre-r17) behave exactly as before.

Usage:
  scripts/benchdiff.py OLD.json NEW.json [--append-scale] [--gate]

Exit 0 unless --gate is passed AND a suspect-real key lacks a SCALE.md
triage entry (exit 3). Without --gate the tool stays informational:
bench multiples need human attribution -- the r5-r8 record shows most
are co-tenant noise, and an unconditional red exit would train people
to override the gate.
--append-scale appends the markdown table to SCALE.md under a dated
heading when anything is flagged.
"""
import json
import re
import statistics
import subprocess
import sys

RATIO_FLOOR = 1.5
HARD_RATIO = 2.0     # the driver's own "unexplained multiple" bar
CONTROL_FLAT = 1.3   # controls at/below this median ratio count as flat
# known-cheap queries whose inflation indicates HOST noise, not a plan
# regression -- rendered alongside flagged rows for attribution
CONTROLS = ("q_topk", "q_pivot", "q_filter_conj", "q_scan_limit")
HOT_POSITION = 1.4   # nearest ctrl row at/above this x its own suite
                     # minimum marks the position as provably hot


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:  # raw bench line / target/bench.json
        return d["queries"], float(d.get("value", 0.0)), d
    parsed = d.get("parsed")
    if not parsed:  # driver artifact whose tail lost the opening brace
        m = re.findall(r'\{"metric":.*?"sf":"[^"]*"\}', d.get("tail", ""))
        if not m:
            sys.exit(f"benchdiff: no bench line recoverable from {path}")
        parsed = json.loads(m[-1])
    return parsed["queries"], float(parsed.get("value", 0.0)), parsed


def ctrl_row_factors(parsed):
    """[(suite position, hotness factor)] from an artifact's ctrl_cs:
    per row, the median over controls of (this row's centiseconds /
    that control's minimum across rows) -- 1.0 = the run's own quiet
    floor, >= HOT_POSITION = a provably hot stretch of the suite."""
    rows = parsed.get("ctrl_cs") or []
    if len(rows) < 2:
        return []
    ncols = len(rows[0]) - 1
    mins = []
    for i in range(ncols):
        vals = [r[i + 1] for r in rows if len(r) > i + 1 and r[i + 1] > 0]
        mins.append(min(vals) if vals else 0)
    out = []
    for r in rows:
        fs = [r[i + 1] / mins[i] for i in range(ncols)
              if len(r) > i + 1 and r[i + 1] > 0 and mins[i] > 0]
        out.append((r[0], statistics.median(fs) if fs else None))
    return [(p, f) for p, f in out if f is not None]


def hot_position_split(hard_keys, new_q, new_parsed):
    """(hot: [(key, pos, ctrl_pos, factor)], cold: [key]): split the
    suspect-real keys by whether their nearest ctrl_cs row proves the
    position hot. No ctrl_cs -> everything stays cold (old behavior)."""
    facs = ctrl_row_factors(new_parsed)
    if not facs:
        return [], list(hard_keys)
    all_keys = sorted(new_q)
    n_total = int(new_parsed.get("n", len(all_keys)))
    scale = n_total / len(all_keys) if all_keys else 1.0
    hot, cold = [], []
    for k in hard_keys:
        pos = all_keys.index(k) * scale if k in all_keys else None
        if pos is None:
            cold.append(k)
            continue
        cpos, f = min(facs, key=lambda t: abs(t[0] - pos))
        if f >= HOT_POSITION:
            hot.append((k, int(pos), cpos, f))
        else:
            cold.append(k)
    return hot, cold


def classify(old_q, new_q, flagged):
    """(signature, control_median, hard_keys): which of the two named
    regression signatures the diff shows, if any."""
    ctl = [new_q[c] / old_q[c]
           for c in CONTROLS if c in old_q and c in new_q and old_q[c] > 0]
    ctl_med = statistics.median(ctl) if ctl else None
    hard = [k for ratio, k, _, _ in flagged if ratio > HARD_RATIO]
    if not hard or ctl_med is None:
        return None, ctl_med, hard
    if ctl_med <= CONTROL_FLAT:
        return "suspect-real", ctl_med, hard
    if ctl_med > RATIO_FLOOR:
        return "host-noise-suspect", ctl_med, hard
    return "ambiguous", ctl_med, hard


def untriaged(hard_keys):
    """Hard-flagged keys with no 'triage' line naming them in SCALE.md."""
    try:
        with open("SCALE.md") as f:
            triage_lines = [ln for ln in f if "triage" in ln.lower()]
    except FileNotFoundError:
        return list(hard_keys)
    return [k for k in hard_keys
            if not any(k in ln for ln in triage_lines)]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    append = "--append-scale" in sys.argv
    gate = "--gate" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old_q, old_total, _old_parsed = load_queries(args[0])
    new_q, new_total, new_parsed = load_queries(args[1])
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
    exit_code = 0
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
        signature, ctl_med, hard = classify(old_q, new_q, flagged)
        if signature == "suspect-real":
            lines.append(
                f"SIGNATURE: suspect-real -- controls flat (median "
                f"{ctl_med:.2f}x) while {len(hard)} key(s) exceed "
                f"{HARD_RATIO}x: {', '.join(hard)}. This is a plan or "
                "suite-hygiene regression until an IsolatedBench "
                "fresh-JVM min-of-3 triage in SCALE.md proves otherwise.")
            hot, cold = hot_position_split(hard, new_q, new_parsed)
            for k, pos, cpos, f in hot:
                lines.append(
                    f"  position-attributed: `{k}` (suite position ~{pos}) "
                    f"-- nearest ctrl_cs row at {cpos} reads {f:.2f}x this "
                    f"run's own control floor (>= {HOT_POSITION}): the "
                    "suite was provably hot there; host pressure, not plan.")
            missing = untriaged(cold)
            if missing:
                lines.append(
                    "UNTRIAGED suspect-real keys (no 'triage:' line in "
                    "SCALE.md names them): " + ", ".join(missing))
                if gate:
                    exit_code = 3
        elif signature == "host-noise-suspect":
            lines.append(
                f"SIGNATURE: host-noise-suspect -- controls inflated too "
                f"(median {ctl_med:.2f}x): re-measure on an idle host "
                "before attributing any multiple to a plan.")
        elif signature == "ambiguous":
            lines.append(
                f"SIGNATURE: ambiguous -- controls at {ctl_med:.2f}x "
                "(neither flat nor clearly inflated): triage the "
                f">{HARD_RATIO}x keys with IsolatedBench anyway.")
        else:
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
    sys.exit(exit_code)


if __name__ == "__main__":
    main()
