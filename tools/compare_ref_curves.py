#!/usr/bin/env python
"""Render the reference-vs-ours AP50-per-epoch comparison table.

Reads two metrics.csv files (same schema: tools/ref_train_compare.py emits
the torch-reference curve, tools/train.py emits ours), aligns them by epoch
and prints a markdown table + the max |delta| over the tail — the artifact
backing the empirical accuracy-parity claim.

  python tools/compare_ref_curves.py runs/ref_compare/torch/metrics.csv \
      runs/ref_compare/ours/1/metrics.csv --tail 10
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_csv(path):
    rows = {}
    with open(path) as f:
        for r in csv.DictReader(f):
            try:
                e = int(float(r["epoch"]))
                rows[e] = {k: float(r[k]) for k in
                           ("AP", "AP50", "AP75", "train_loss", "val_loss")}
            except (ValueError, KeyError):
                continue
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_csv")
    ap.add_argument("ours_csv")
    ap.add_argument("--tail", type=int, default=10,
                    help="epochs from the end used for the parity verdict")
    ap.add_argument("--every", type=int, default=5,
                    help="table row stride")
    args = ap.parse_args()

    ref = read_csv(args.ref_csv)
    ours = read_csv(args.ours_csv)
    common = sorted(set(ref) & set(ours))
    if not common:
        print("no common epochs")
        return 1

    print("| epoch | ref AP50 | ours AP50 | ΔAP50 | ref AP | ours AP | "
          "ref train loss | ours train loss |")
    print("|---|---|---|---|---|---|---|---|")
    for e in common:
        if e % args.every and e != common[-1]:
            continue
        r, o = ref[e], ours[e]
        print(f"| {e} | {r['AP50']:.4f} | {o['AP50']:.4f} | "
              f"{o['AP50'] - r['AP50']:+.4f} | {r['AP']:.4f} | {o['AP']:.4f} | "
              f"{r['train_loss']:.3f} | {o['train_loss']:.3f} |")

    tail = [e for e in common if e > common[-1] - args.tail]
    deltas = [ours[e]["AP50"] - ref[e]["AP50"] for e in tail]
    best_ref = max(ref[e]["AP50"] for e in common)
    best_ours = max(ours[e]["AP50"] for e in common)
    print(f"\nbest AP50: ref {best_ref:.4f}  ours {best_ours:.4f}  "
          f"delta {best_ours - best_ref:+.4f}")
    print(f"tail-{len(tail)} mean ΔAP50 {sum(deltas)/len(deltas):+.4f}, "
          f"max |Δ| {max(abs(d) for d in deltas):.4f}")
    verdict = "PARITY (|Δ| ≤ 0.1)" if abs(best_ours - best_ref) <= 0.1 \
        else "DIVERGED (|Δ| > 0.1)"
    print(f"verdict: {verdict}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
