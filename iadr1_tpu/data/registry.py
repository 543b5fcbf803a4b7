"""Dataset registry: dataset_info.json compatibility.

Parses the same registry format the reference uses (data/dataset_info.json,
llamafactory/data/parser.py): name -> file location + formatting
(sharegpt/alpaca) + column/tag mapping.  A user of the reference can point
this framework at their existing dataset_info.json unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path


@dataclasses.dataclass
class DatasetAttr:
    name: str
    file_name: str | None = None
    # remote sources (reference data/parser.py load_from hf_hub/ms_hub/
    # om_hub): parsed so dataset_info.json files round-trip, loaded only
    # when the hub library + network are actually available
    hf_hub_url: str | None = None
    ms_hub_url: str | None = None
    formatting: str = "alpaca"          # "alpaca" | "sharegpt"
    split: str = "train"
    num_samples: int | None = None
    # column mapping
    messages: str = "conversations"
    images: str | None = None
    videos: str | None = None
    system: str | None = None
    tools: str | None = None
    # alpaca columns
    prompt: str = "instruction"
    query: str = "input"
    response: str = "output"
    history: str | None = None
    # sharegpt tags
    role_tag: str = "from"
    content_tag: str = "value"
    user_tag: str = "human"
    assistant_tag: str = "gpt"
    observation_tag: str = "observation"
    function_tag: str = "function_call"
    system_tag: str = "system"


def load_dataset_registry(path: str | Path) -> dict[str, DatasetAttr]:
    """dataset_info.json -> {name: DatasetAttr}."""
    with open(path) as f:
        info = json.load(f)
    registry: dict[str, DatasetAttr] = {}
    for name, spec in info.items():
        attr = DatasetAttr(name=name, file_name=spec.get("file_name"))
        attr.hf_hub_url = spec.get("hf_hub_url")
        attr.ms_hub_url = spec.get("ms_hub_url")
        attr.formatting = spec.get("formatting", "alpaca")
        attr.split = spec.get("split", "train")
        attr.num_samples = spec.get("num_samples")
        columns = spec.get("columns", {})
        for col in ("messages", "images", "videos", "system", "tools",
                    "prompt", "query", "response", "history"):
            if col in columns:
                setattr(attr, col, columns[col])
        tags = spec.get("tags", {})
        for tag in ("role_tag", "content_tag", "user_tag", "assistant_tag",
                    "observation_tag", "function_tag", "system_tag"):
            if tag in tags:
                setattr(attr, tag, tags[tag])
        registry[name] = attr
    return registry


def load_json_dataset(attr: DatasetAttr, base_dir: str | None = None) -> list[dict]:
    """Load the rows of a dataset: local json/jsonl, or a hub dataset when
    the environment has `datasets` + network access (reference
    data/loader.py:70-130 load_from hf_hub/ms_hub)."""
    if attr.file_name is None:
        if attr.hf_hub_url:
            try:
                from datasets import load_dataset  # type: ignore
            except ImportError as e:
                raise RuntimeError(
                    f"dataset {attr.name!r} is hub-backed ({attr.hf_hub_url}) "
                    "but the `datasets` library is unavailable; download the "
                    "data and point file_name at the local JSON instead"
                ) from e
            ds = load_dataset(attr.hf_hub_url, split=attr.split)
            rows = list(ds)
            if attr.num_samples is not None:
                rows = rows[: attr.num_samples]
            return rows
        if attr.ms_hub_url:
            raise RuntimeError(
                f"dataset {attr.name!r} is ModelScope-hub-backed "
                f"({attr.ms_hub_url}); ModelScope is not available in this "
                "environment -- download the data and set file_name"
            )
        raise ValueError(f"dataset {attr.name!r} has no file_name or hub url")
    path = attr.file_name
    if base_dir and not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    with open(path) as f:
        if path.endswith(".jsonl"):
            rows = [json.loads(line) for line in f if line.strip()]
        else:
            rows = json.load(f)
    if attr.num_samples is not None:
        rows = rows[: attr.num_samples]
    return rows
