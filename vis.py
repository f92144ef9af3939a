"""Visualization entry point: render overlays from a results.pkl.

Usage: python vis.py --results logs/<run>/results.pkl --out vis_out \
           --num-classes 15 [--slices 0.25 0.5 0.75]

Capability parity with the reference vis.py matplotlib overlay renderer.
"""
import argparse

from diff_unet_tpu.utils.vis import render_results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results", required=True)
    p.add_argument("--out", default="vis_out")
    p.add_argument("--num-classes", type=int, required=True)
    p.add_argument("--slices", type=float, nargs="+",
                   default=[0.25, 0.5, 0.75])
    args = p.parse_args()
    n = render_results(args.results, args.out, args.num_classes, args.slices)
    print(f"wrote {n} overlays to {args.out}")


if __name__ == "__main__":
    main()
