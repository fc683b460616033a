"""Video captioning + DiffSynth-style metadata generation.

Mirror of /root/reference/infinicube/data_process/generate_caption.py
(Qwen2-VL captioning under a DistributedProcessor, :110-333) and
generate_metadata_csv.py. The VLM is a gated hook (needs downloaded
weights); without it a template captioner keeps the pipeline runnable."""

from __future__ import annotations

import csv
import dataclasses
from pathlib import Path
from typing import Callable, Iterable


@dataclasses.dataclass
class DistributedProcessor:
    """Per-host slice processor (the reference's torchrun base class
    mapped to jax process topology)."""
    process_index: int = 0
    process_count: int = 1

    def my_items(self, items: list) -> list:
        return [x for i, x in enumerate(items)
                if i % self.process_count == self.process_index]

    def run(self, items: Iterable, fn: Callable):
        return [fn(x) for x in self.my_items(list(items))]


_CAPTIONER = None


def register_captioner(fn: Callable):
    """fn(video_path) -> str; plug a VLM (Qwen2-VL in the reference) here."""
    global _CAPTIONER
    _CAPTIONER = fn


def caption_video(video_path: str | Path) -> str:
    if _CAPTIONER is not None:
        return _CAPTIONER(video_path)
    return ("A realistic driving scene captured from a vehicle-mounted "
            "front camera, with roads, vehicles and surroundings.")


def generate_captions(video_paths: list, output_json: str | Path,
                      proc: DistributedProcessor | None = None):
    import json
    proc = proc or DistributedProcessor()
    caps = {str(p): caption_video(p) for p in proc.my_items(video_paths)}
    out = Path(output_json)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(caps, indent=1))
    return caps


def generate_metadata_csv(captions: dict, output_csv: str | Path):
    """DiffSynth-format metadata.csv (file_name, text)."""
    out = Path(output_csv)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file_name", "text"])
        for path, text in sorted(captions.items()):
            w.writerow([Path(path).name, text])
