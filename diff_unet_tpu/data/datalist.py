"""Decathlon datalist + class-map loading.

Capability parity with the reference's `load_decathlon_datalist`
(utils.py:54-100, a local copy of MONAI's loader with test-list handling) and
`get_class_names` (utils.py:47-51).
"""
from __future__ import annotations

import json
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Optional, Union

import yaml


def _append_paths(base_dir: Path, is_segmentation: bool,
                  items: list) -> list[dict]:
    out = []
    for item in items:
        item = dict(item)
        for key in ("image", "label"):
            v = item.get(key)
            if isinstance(v, str):
                item[key] = str((base_dir / v).resolve())
            elif isinstance(v, list):
                item[key] = [str((base_dir / p).resolve()) for p in v]
        out.append(item)
    return out


def load_decathlon_datalist(
    data_list_file_path: Union[str, Path],
    is_segmentation: bool = True,
    data_list_key: str = "training",
    base_dir: Optional[Union[str, Path]] = None,
) -> list[dict]:
    """dataset.json -> list of {"image": path, "label": path} dicts."""
    path = Path(data_list_file_path)
    if not path.is_file():
        raise ValueError(f"Data list file {path} does not exist.")
    with open(path) as f:
        json_data = json.load(f)
    if data_list_key not in json_data:
        raise ValueError(
            f'Data list {data_list_key} not specified in "{path}".'
        )
    expected = json_data[data_list_key]
    if data_list_key == "test" and expected and not isinstance(
        expected[0], dict
    ):
        expected = [{"image": i} for i in expected]
    base = Path(base_dir) if base_dir is not None else path.parent
    return _append_paths(base, is_segmentation, expected)


def get_class_names(
    classes_yaml: Union[str, Path],
    include_background: bool = False,
    bg_index: int = 0,
) -> "OrderedDict[int, str]":
    """classes.yaml -> OrderedDict{id: organ}, optionally stripping bg."""
    with open(classes_yaml) as f:
        classes = OrderedDict(yaml.safe_load(f))
    if not include_background and bg_index in classes:
        del classes[bg_index]
    return classes
