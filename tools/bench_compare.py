#!/usr/bin/env python3
"""Diff two bench JSONs (graft.Bench output, or a driver BENCH_r*.json
whose payload sits under "parsed") and rank the per-query movement —
the first step of every drift adjudication (BASELINE.md protocol:
isolate with SPARK_GRAFT_BENCH_ONLY before believing any single line).

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
  python3 tools/bench_compare.py --paired OLD.json NEW.json

Prints lines present in both files sorted by ratio (new/old), flags
ratios beyond the threshold either way, and reports lines only in one
file (inventory growth/removal) plus the totals and the r5-inventory
anchor when BENCH_r05.json is present next to this script's repo root.

--paired (VERDICT r17 #3, the noise-proof closing protocol): OLD and
NEW are SAME-BOX INTERLEAVED samples — the last-blessed HEAD run from a
fresh worktree alongside the new HEAD in one session, so box state
cancels in the ratio. A line is then flagged only when its paired ratio
exceeds BOTH the threshold and the line's own observed rep spread
(max/min across raw reps, recorded per file under "spread") — movement
that the same-box noise already explains is not a regression. The
PAIRED anchor ratio (new anchor / old anchor, same box, same hour) is
the closing certification's headline number, not either absolute
anchor.
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
    paired = False
    rest = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--paired":
            paired = True
        elif a == "--threshold" or a.startswith("--threshold="):
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
    # per-line rep spreads (max/min across raw runs) — the noise each
    # file itself observed; --paired refuses to flag movement inside it
    so = old.get("spread", {}) or {}
    sn = new.get("spread", {}) or {}

    shared = sorted(set(qo) & set(qn),
                    key=lambda k: -(qn[k] / qo[k] if qo[k] else float("inf")))
    flagged = 0
    mode = "paired (same-box interleave)" if paired else "unpaired"
    print(f"mode: {mode}")
    print(f"{'query':36} {'old':>8} {'new':>8} {'ratio':>7}")
    for k in shared:
        r = qn[k] / qo[k] if qo[k] else float("inf")
        # in --paired mode a line must move beyond BOTH the threshold
        # and its own observed rep spread to be flagged — same-box
        # interleaving already cancelled slow box drift, so the rep
        # spread is the remaining per-line noise bound
        bar = thr
        if paired:
            for sp in (so.get(k), sn.get(k)):
                if isinstance(sp, (int, float)) and sp > bar:
                    bar = sp
        mark = ""
        if r >= bar:
            mark, flagged = "  << slower", flagged + 1
        elif r <= 1 / bar:
            mark = "  >> faster"
        # the long flat middle is noise; print only the tails and any flag
        if mark or r >= 1.15 or r <= 1 / 1.15:
            sptxt = ""
            if paired and (so.get(k) or sn.get(k)):
                sptxt = (f"  [spread {so.get(k) or 1.0:.2f}/"
                         f"{sn.get(k) or 1.0:.2f}]")
            print(f"{k:36} {qo[k]:8.2f} {qn[k]:8.2f} {r:7.2f}{mark}{sptxt}")
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
        anchors = {}
        for tag, q in (("old", qo), ("new", qn)):
            anchors[tag] = sum(v for k, v in q.items() if k in a5)
            if anchors[tag]:
                print(f"anchor_total ({tag}): {anchors[tag]:.2f} = "
                      f"{anchors[tag] / 77.87:.2f}x of the blessed 77.87")
        if paired and anchors.get("old") and anchors.get("new"):
            print(f"PAIRED anchor ratio (new/old, box cancels): "
                  f"{anchors['new'] / anchors['old']:.3f}")
    if paired:
        print(f"\n{flagged} line(s) beyond max(threshold {thr}x, own rep "
              "spread) under same-box pairing — these are the only "
              "candidates worth an isolated drill.")
    else:
        print(f"\n{flagged} line(s) beyond {thr}x — isolate each with "
              "SPARK_GRAFT_BENCH_ONLY (plus its _memo_* deps) before "
              "believing it (BASELINE.md protocol).")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        os._exit(0)
