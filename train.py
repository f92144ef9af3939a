"""Training entry point: `python train.py --config cfg/<ds>/train.yaml`.

Capability parity with the reference train.py:323-327 — the YAML config is
splatted into the Trainer as kwargs; `key=value` CLI overrides are supported
(e.g. `python train.py --config cfg/amos/train.yaml max_epochs=10`).
"""
import warnings

from diff_unet_tpu.engine.engine import Trainer
from diff_unet_tpu.utils.config import parse_args

warnings.filterwarnings("ignore")


def main():
    cfg = parse_args()
    kwargs = {k: v for k, v in cfg.items() if not k.startswith("__")}
    # keys consumed by the reference but replaced by the mesh runtime
    for legacy in ("device", "device_ids"):
        kwargs.pop(legacy, None)
    trainer = Trainer(**kwargs)
    trainer.train()


if __name__ == "__main__":
    main()
