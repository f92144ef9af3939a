"""Legacy direct-NIfTI dataset.

Capability parity with the reference's `dataset/base_dataset.py:12-100`
(BaseDataset.read_data: raw NIfTI load, zero-pad of the last axis,
(H, W, D) -> (D, W, H) transpose, in-RAM dict cache keyed by path) and its
empty AMOS/BTCV/MSD subclasses (dataset/{amos,btcv,msd}_dataset.py).

The live path uses `data.dataset.CacheDataset` with the full MONAI-parity
transform chain; this shim exists for users migrating code built on the
legacy loader. Channel-last: volumes come back (D, W, H, 1).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from diff_unet_tpu.data.nifti import read_nifti


class BaseDataset:
    def __init__(
        self,
        data_list: List[Tuple[str, str]],
        *,
        pad: int = 2,
        mode: str = "train",
        use_cache: bool = True,
    ) -> None:
        self.data_list = list(data_list)
        self.pad = pad
        self.mode = mode
        self.cache: Dict[str, Dict] = {}
        if use_cache:
            for d in self.data_list:
                self.read_data(d)

    def read_data(self, data_path: Sequence[str]) -> Dict:
        key = data_path[0]
        if key in self.cache:
            return self.cache[key]
        image = np.asarray(read_nifti(data_path[0]).data, np.float32)
        label = np.asarray(read_nifti(data_path[1]).data)

        p = self.pad
        # reference pads only the last axis (F.pad with a 2-tuple)
        image = np.pad(image, ((0, 0), (0, 0), (p, p)))
        label = np.pad(label, ((0, 0), (0, 0), (p, p)))

        # (H, W, D) -> (D, W, H), add trailing channel
        image = np.ascontiguousarray(np.swapaxes(image, 0, 2))[..., None]
        label_t = np.ascontiguousarray(np.swapaxes(label, 0, 2))[..., None]

        item = {"image": image, "label": label_t}
        if self.mode == "test":
            raw = np.asarray(read_nifti(data_path[1]).data)
            item["raw_label"] = np.ascontiguousarray(
                np.swapaxes(raw, 0, 2)
            )[..., None]
        self.cache[key] = item
        return item

    def __len__(self) -> int:
        return len(self.data_list)

    def __getitem__(self, i: int):
        return self.read_data(self.data_list[i]), self.data_list[i][0]


class AMOSDataset(BaseDataset):
    pass


class BTCVDataset(BaseDataset):
    pass


class MSDDataset(BaseDataset):
    pass
