"""Evaluation entry point: `python test.py --config cfg/<ds>/test.yaml`.

Capability parity with the reference test.py:190-193 — loads a checkpoint,
runs sliding-window DDIM inference over the validation set, prints the
per-class dice/HD95 table, and writes results.pkl.
"""
import warnings

from diff_unet_tpu.engine.engine import Tester
from diff_unet_tpu.utils.config import parse_args

warnings.filterwarnings("ignore")


def main():
    cfg = parse_args()
    kwargs = {k: v for k, v in cfg.items() if not k.startswith("__")}
    for legacy in ("device", "device_ids", "remove_bg"):
        kwargs.pop(legacy, None)
    tester = Tester(**kwargs)
    tester.test()


if __name__ == "__main__":
    main()
