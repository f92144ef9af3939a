"""Aggregate evaluation artifacts — the reference's lab.ipynb workflow as a
script.

The reference explores `results.pkl` / `dices.pkl` interactively
(lab.ipynb: per-organ dice aggregation over cases, best/worst case lists,
checkpoint pruning by dice). This script covers the analysis half:

    python examples/aggregate_results.py logs/<run>/results.pkl \
        --classes cfg/amos/classes.yaml [--worst 5]

Prints the per-organ mean/std dice and HD95 table, overall mean, and the
N worst cases by mean dice (the inputs to lab.ipynb's pruning decisions).
"""
from __future__ import annotations

import argparse
import pickle

import numpy as np


def aggregate(results: dict, class_names: dict | None = None,
              worst: int = 5) -> dict:
    dices = np.asarray(results["dices"], np.float64)       # (cases, C)
    hd95s = np.asarray(results["hd95s"], np.float64)
    names = (list(class_names.values())
             if class_names else [str(i + 1) for i in range(dices.shape[1])])

    per_class = {
        name: {
            "dice_mean": float(np.mean(dices[:, c])),
            "dice_std": float(np.std(dices[:, c])),
            "hd95_mean": float(np.mean(hd95s[:, c][np.isfinite(hd95s[:, c])])
                               if np.isfinite(hd95s[:, c]).any()
                               else float("inf")),
        }
        for c, name in enumerate(names)
    }
    case_means = dices.mean(axis=1)
    order = np.argsort(case_means)
    files = results.get("filenames", [None] * len(case_means))
    worst_cases = [
        {"case": files[i] or f"case_{i}", "mean_dice": float(case_means[i])}
        for i in order[:worst]
    ]
    return {
        "mean_dice": float(case_means.mean()) if len(case_means) else 0.0,
        "per_class": per_class,
        "worst_cases": worst_cases,
        "num_cases": int(len(case_means)),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results_pkl")
    ap.add_argument("--classes", default=None,
                    help="classes.yaml for organ names")
    ap.add_argument("--worst", type=int, default=5)
    args = ap.parse_args()

    with open(args.results_pkl, "rb") as f:
        results = pickle.load(f)
    class_names = None
    if args.classes:
        from diff_unet_tpu.data import get_class_names
        class_names = get_class_names(args.classes, include_background=False)

    summary = aggregate(results, class_names, args.worst)
    width = max(len(n) for n in summary["per_class"])
    print(f"{'organ':<{width}}  dice(mean+-std)     hd95")
    for name, row in summary["per_class"].items():
        print(f"{name:<{width}}  {row['dice_mean']:.4f} +- "
              f"{row['dice_std']:.4f}   {row['hd95_mean']:8.2f}")
    print(f"\nmean dice over {summary['num_cases']} cases: "
          f"{summary['mean_dice']:.4f}")
    print("\nworst cases:")
    for c in summary["worst_cases"]:
        print(f"  {c['case']}: {c['mean_dice']:.4f}")


if __name__ == "__main__":
    main()
