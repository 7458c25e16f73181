"""Metrics/event writers: console, JSONL, optional TensorBoard.

The functional analog of the reference's global event-queue writer
(``nerfstudio/utils/writer.py``, SURVEY.md §5): scalars/images are buffered
per step and drained to all configured sinks.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class Writer:
    def __init__(self, out_dir, use_tensorboard: bool = True,
                 console_every: int = 10):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.out_dir / "events.jsonl", "a")
        self.console_every = console_every
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.out_dir / "tb"))
            except Exception:
                self.tb = None
        self._t0 = time.time()

    def scalars(self, step: int, values: dict):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in values.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in values.items():
                self.tb.add_scalar(k, float(v), step)
        if self.console_every and step % self.console_every == 0:
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in values.items())
            print(f"[step {step:6d}] {parts}", flush=True)

    def image(self, step: int, name: str, img):
        import numpy as np

        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        from PIL import Image

        img_dir = self.out_dir / "images"
        img_dir.mkdir(exist_ok=True)
        Image.fromarray(arr).save(img_dir / f"{name}_{step:09d}.png")
        if self.tb is not None:
            self.tb.add_image(name, arr, step, dataformats="HWC")

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
