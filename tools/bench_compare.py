#!/usr/bin/env python3
"""Diff two bench JSONs (graft.Bench output, or a driver BENCH_r*.json
whose payload sits under "parsed") and rank the per-query movement —
the first step of every drift adjudication (BASELINE.md protocol:
isolate with SPARK_GRAFT_BENCH_ONLY before believing any single line).

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]

Prints lines present in both files sorted by ratio (new/old), flags
ratios beyond the threshold either way, and reports lines only in one
file (inventory growth/removal) plus the totals and the r5-inventory
anchor when BENCH_r05.json is present next to this script's repo root.
"""
import json
import os
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main():
    # parse --threshold first (both `--threshold=1.3` and `--threshold 1.3`),
    # CONSUMING its value so the space-separated form doesn't leak into the
    # positional file args (ADVICE r16: the value doesn't start with `--`,
    # so the old filter kept it and the script exited with the usage text)
    thr = 1.3
    rest = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold" or a.startswith("--threshold="):
            if "=" in a:
                raw = a.split("=", 1)[1]
            else:
                if i + 1 >= len(argv):
                    sys.exit("--threshold needs a value\n" + __doc__)
                raw = argv[i + 1]
                i += 1
            try:
                thr = float(raw)
            except ValueError:
                sys.exit(f"--threshold needs a number, got {raw!r}\n"
                         + __doc__)
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a!r}\n" + __doc__)
        else:
            rest.append(a)
        i += 1
    args = rest
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    qo = {k: v for k, v in qo.items() if isinstance(v, (int, float))}
    qn = {k: v for k, v in qn.items() if isinstance(v, (int, float))}

    shared = sorted(set(qo) & set(qn),
                    key=lambda k: -(qn[k] / qo[k] if qo[k] else float("inf")))
    flagged = 0
    print(f"{'query':36} {'old':>8} {'new':>8} {'ratio':>7}")
    for k in shared:
        r = qn[k] / qo[k] if qo[k] else float("inf")
        mark = ""
        if r >= thr:
            mark, flagged = "  << slower", flagged + 1
        elif r <= 1 / thr:
            mark = "  >> faster"
        # the long flat middle is noise; print only the tails and any flag
        if mark or r >= 1.15 or r <= 1 / 1.15:
            print(f"{k:36} {qo[k]:8.2f} {qn[k]:8.2f} {r:7.2f}{mark}")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old:
        print(f"\nonly in OLD ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"\nonly in NEW ({len(only_new)}): {', '.join(only_new)}")

    to, tn = old.get("value"), new.get("value")
    if to and tn:
        print(f"\ntotal: {to:.2f} -> {tn:.2f}  ({tn / to:.2f}x)")
    shared_sum_o = sum(qo[k] for k in shared)
    shared_sum_n = sum(qn[k] for k in shared)
    if shared_sum_o:
        print(f"shared-lines total: {shared_sum_o:.2f} -> "
              f"{shared_sum_n:.2f}  ({shared_sum_n / shared_sum_o:.2f}x)")
    anchor_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_r05.json")
    if os.path.exists(anchor_path):
        a5 = load(anchor_path).get("queries", {})
        for tag, q in (("old", qo), ("new", qn)):
            anchor = sum(v for k, v in q.items() if k in a5)
            if anchor:
                print(f"anchor_total ({tag}): {anchor:.2f} = "
                      f"{anchor / 77.87:.2f}x of the blessed 77.87")
    print(f"\n{flagged} line(s) beyond {thr}x — isolate each with "
          "SPARK_GRAFT_BENCH_ONLY (plus its _memo_* deps) before "
          "believing it (BASELINE.md protocol).")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        os._exit(0)
