#!/usr/bin/env python
"""Summarize HardSynth-20 study runs into a markdown table.

Scans run dirs (metrics.csv + merged_config.yaml) given as `name=dir` pairs
(or autodiscovers runs/train/*), prints per-run best AP rows plus the AP50
curve at fixed epochs for recipe comparisons.

  python tools/summarize_hardsynth.py edge_n=runs/train/1 edge_s=runs/train/3
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yololite_tpu.eval.plots import read_metrics_csv  # noqa: E402


def summarize(name, run_dir):
    """run_dir may be a single dir or 'dir1+dir2+...' for chunked runs
    (tools/run_chunked_train.sh allocates one run dir per chunk); the
    per-epoch rows are concatenated, later chunks winning duplicate epochs."""
    rows_by_epoch = {}
    for part in run_dir.split("+"):
        csv_path = os.path.join(part, "metrics.csv")
        if not os.path.exists(csv_path):
            continue
        d = read_metrics_csv(csv_path)
        for e, ap, ap50, ap75, aps in zip(
                d["epoch"], d["AP"], d["AP50"], d["AP75"], d["APS"]):
            if ap == ap and ap >= 0:  # drop non-eval epochs (NaN)
                rows_by_epoch[int(e)] = (int(e), ap, ap50, ap75, aps)
    rows = [rows_by_epoch[e] for e in sorted(rows_by_epoch)]
    d = {"epoch": [r[0] for r in rows] or [0]}
    if not rows:
        return None
    best = max(rows, key=lambda r: r[2])
    curve = {e: ap50 for e, _, ap50, _, _ in rows}
    return {"name": name, "epochs": int(max(d["epoch"])),
            "best_epoch": best[0], "AP": best[1], "AP50": best[2],
            "AP75": best[3], "APS": best[4], "curve": curve}


def main():
    pairs = []
    for arg in sys.argv[1:]:
        name, _, run_dir = arg.partition("=")
        pairs.append((name, run_dir))
    results = [r for r in (summarize(n, d) for n, d in pairs) if r]
    if not results:
        print("no runs found")
        return
    print("| run | epochs | best AP50 (epoch) | AP | AP75 | APS |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['name']} | {r['epochs']} | {r['AP50']:.3f} "
              f"({r['best_epoch']}) | {r['AP']:.3f} | {r['AP75']:.3f} | "
              f"{r['APS']:.3f} |")
    marks = sorted({e for r in results for e in r["curve"]})
    print("\nAP50 curve:")
    print("| run | " + " | ".join(f"ep{e}" for e in marks) + " |")
    print("|---" * (len(marks) + 1) + "|")
    for r in results:
        cells = [f"{r['curve'][e]:.3f}" if e in r["curve"] else "—"
                 for e in marks]
        print(f"| {r['name']} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
