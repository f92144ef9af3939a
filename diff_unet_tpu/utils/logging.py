"""Observability: metric logging, tables, image dumps.

Capability parity with the reference's component #38 (SURVEY.md): wandb
scalar logging with resume (engine.py:209-211), per-class dice tables
(test.py:150-159), PrettyTable config dump (utils.py:260-264), tqdm-style
progress (train.py:219-244), and PNG mid-slice dumps
(light_training/utils/log_image.py:7-20) — with wandb strictly optional
(gated import; the environment has no wandb) and a JSONL sink so every run
is machine-readable without external services.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np


def format_table(headers: Sequence[str], rows: Sequence[Sequence]) -> str:
    """ASCII table (replaces the prettytable dependency, utils.py:260-264)."""
    cells = [[str(h) for h in headers]] + [
        [str(c) for c in row] for row in rows
    ]
    widths = [max(len(r[i]) for r in cells) for i in range(len(headers))]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    for i, row in enumerate(cells):
        out.append(
            "|" + "|".join(f" {c:<{w}} " for c, w in zip(row, widths)) + "|"
        )
        if i == 0:
            out.append(sep)
    out.append(sep)
    return "\n".join(out)


class MetricLogger:
    """Scalar/metric sink: stdout + JSONL file + optional wandb."""

    def __init__(
        self,
        log_dir: Optional[str] = None,
        *,
        use_wandb: bool = False,
        project_name: Optional[str] = None,
        run_name: Optional[str] = None,
        wandb_id: Optional[str] = None,
        config: Optional[Dict] = None,
    ) -> None:
        self.log_dir = Path(log_dir) if log_dir else None
        self._file = None
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            self._file = open(self.log_dir / "metrics.jsonl", "a")
        # wandb starts LAZILY (first log/table call, or wandb_id access):
        # Engine constructs the logger before a checkpoint's saved run id is
        # known (Trainer.load_checkpoint), and an eager init would open a
        # NEW run instead of resuming the old one (reference restores the id
        # first and passes it to wandb.init, train.py:152-164).
        self._wandb = None
        self._wandb_failed = False
        self._use_wandb = use_wandb
        self._project_name = project_name
        self._run_name = run_name
        self._config = config
        self._pending_id = wandb_id

    def _ensure_wandb(self) -> None:
        if (not self._use_wandb or self._wandb is not None
                or self._wandb_failed):
            return
        try:
            import wandb  # optional; absent in this environment
            if self._pending_id:
                self._wandb = wandb.init(
                    project=self._project_name, id=self._pending_id,
                    resume=True,
                )
            else:
                self._wandb = wandb.init(
                    project=self._project_name, name=self._run_name,
                    config=self._config,
                )
            self._pending_id = self._wandb.id
        except Exception as e:  # pragma: no cover
            self._wandb_failed = True
            print(f"[logger] wandb unavailable ({e}); falling back to "
                  "stdout/jsonl", file=sys.stderr)

    @property
    def wandb_id(self):
        """The run id to persist into checkpoints (engine.py:136-140).
        Starts the wandb run on first access so the id exists to save."""
        self._ensure_wandb()
        return self._pending_id or 0

    def resume(self, wandb_id) -> None:
        """Adopt a checkpoint-restored run id so subsequent logging
        continues the SAME wandb run (reference train.py:152-164 +
        engine.py:209-211). If a different run was already started, it is
        finished and re-initialized with `resume=True`."""
        if not wandb_id:
            return
        if self._wandb is not None:
            if getattr(self._wandb, "id", None) == wandb_id:
                return
            self._wandb.finish()  # pragma: no cover - needs an eager run
            self._wandb = None
        self._pending_id = wandb_id
        self._ensure_wandb()

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        self._ensure_wandb()
        record = {"time": time.time(), "step": step, **{
            k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
            for k, v in metrics.items()
        }}
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)

    def log_scalar(self, key: str, value, step: Optional[int] = None):
        self.log({key: value}, step)

    def per_class_table(self, class_names: Dict[int, str],
                        dices: Sequence[float],
                        hd95s: Optional[Sequence[float]] = None,
                        ious: Optional[Sequence[float]] = None) -> str:
        """dice / hd95 / iou columns — the reference's wandb test table
        (test.py:82-83, 150-159)."""
        headers = (["class", "dice"]
                   + (["hd95"] if hd95s is not None else [])
                   + (["iou"] if ious is not None else []))
        rows = []
        for i, (cid, name) in enumerate(class_names.items()):
            row = [f"{cid}:{name}", f"{float(dices[i]):.4f}"]
            if hd95s is not None:
                row.append(f"{float(hd95s[i]):.2f}")
            if ious is not None:
                row.append(f"{float(ious[i]):.4f}")
            rows.append(row)
        return format_table(headers, rows)

    # ---- per-case segmentation table (reference wandb table parity) -----
    def start_case_table(self, class_names: Dict[int, str]) -> None:
        """Begin the per-case results table.

        Reference: `wandb.Table(columns=["patient","image","dice","hd95",
        "iou"] + class_names)` (test.py:82-83) filled by `log_plot`'s
        `wandb.Image(image, masks={"prediction": ..., "label": ...})`
        (engine.py:226-243). When wandb is importable the exact same table
        is built; regardless, every row is mirrored to `cases.jsonl` so the
        artifact exists without external services.
        """
        self._ensure_wandb()
        self._case_class_names = dict(class_names)
        self._case_rows: list = []
        self._case_table = None
        if self._wandb is not None:  # pragma: no cover - needs wandb
            import wandb
            self._case_table = wandb.Table(
                columns=["patient", "image", "dice", "hd95", "iou"]
                + list(class_names.values())
            )

    def add_case(
        self,
        patient: str,
        image2d: np.ndarray,
        pred_mask2d: np.ndarray,
        label_mask2d: np.ndarray,
        mean_dice: float,
        mean_hd95: float,
        mean_iou: float,
        class_dices: Sequence[float],
    ) -> None:
        """One table row: mid-slice image with prediction/label mask
        overlays + case metrics (engine.py:217-248 `log_plot`)."""
        def _num(v):
            v = float(v)
            return v if np.isfinite(v) else None  # strict-JSON safe

        row = {
            "patient": patient,
            "dice": _num(mean_dice),
            "hd95": _num(mean_hd95),
            "iou": _num(mean_iou),
            **{
                name: _num(d)
                for name, d in zip(self._case_class_names.values(),
                                   class_dices)
            },
        }
        self._case_rows.append(row)
        if self._case_table is not None:  # pragma: no cover - needs wandb
            import wandb
            # masks carry CLASS IDS (0 = background); the overlay legend
            # needs an explicit background entry or wandb renders id 0 with
            # the first organ's name (ADVICE r3)
            class_labels = {0: "background", **self._case_class_names}
            # wandb mis-renders float intensities outside [0,1]; min-max
            # normalize to uint8 like the reference's get_numpy_image *255
            # cast (engine.py:184-196)
            img = np.asarray(image2d, np.float32)
            lo, hi = float(img.min()), float(img.max())
            img8 = ((img - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
            plot = wandb.Image(
                img8,
                masks={
                    "prediction": {
                        "mask_data": np.asarray(pred_mask2d),
                        "class_labels": class_labels,
                    },
                    "label": {
                        "mask_data": np.asarray(label_mask2d),
                        "class_labels": class_labels,
                    },
                },
            )
            self._case_table.add_data(
                patient, plot, float(mean_dice), float(mean_hd95),
                float(mean_iou), *[float(d) for d in class_dices]
            )

    def log_case_table(self) -> None:
        """Flush the table: `wandb.log({"table": self.table})`
        (test.py:110) + the local `cases.jsonl` mirror."""
        if self.log_dir and getattr(self, "_case_rows", None) is not None:
            with open(self.log_dir / "cases.jsonl", "w") as f:
                for row in self._case_rows:
                    f.write(json.dumps(row) + "\n")
        if (self._wandb is not None
                and self._case_table is not None):  # pragma: no cover
            self._wandb.log({"table": self._case_table})

    def save_midslice_png(self, path, image: np.ndarray,
                          output: Optional[np.ndarray] = None,
                          label: Optional[np.ndarray] = None,
                          frac: float = 0.75) -> bool:
        """Mid-slice overlay dump (engine.py:184-207 + vis.py renderer)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:  # pragma: no cover
            return False
        idx = int(image.shape[0] * frac)
        panels = [("image", image[idx], "gray")]
        if output is not None:
            panels.append(("output", output[idx], "viridis"))
        if label is not None:
            panels.append(("label", label[idx], "viridis"))
        fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
        axes = np.atleast_1d(axes)
        for ax, (title, img2d, cmap) in zip(axes, panels):
            ax.imshow(np.asarray(img2d), cmap=cmap)
            ax.set_title(title)
            ax.axis("off")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return True

    def close(self):
        if self._file:
            self._file.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()


class ProgressMeter:
    """Minimal tqdm replacement: rate + loss postfix on stdout."""

    def __init__(self, total: int, desc: str = "", every: int = 10):
        self.total = total
        self.desc = desc
        self.every = every
        self.n = 0
        self.t0 = time.time()

    def update(self, **postfix) -> None:
        self.n += 1
        if self.n % self.every == 0 or self.n == self.total:
            rate = self.n / max(time.time() - self.t0, 1e-9)
            extras = " ".join(f"{k}={v:.4g}" for k, v in postfix.items())
            print(f"{self.desc} [{self.n}/{self.total}] "
                  f"{rate:.2f} it/s {extras}", flush=True)
