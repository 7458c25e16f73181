"""Metrics/event writers: console, JSONL, TensorBoard, wandb, comet.

The functional analog of the reference's global event-queue writer
(``nerfstudio/utils/writer.py``, SURVEY.md §5): scalars/images are buffered
per step and drained to all configured sinks. The wandb/comet sinks mirror
``nerfstudio/utils/writer.py:304-534`` (WandbWriter / CometWriter): they
activate when the corresponding package is importable and no-op cleanly
otherwise (this environment ships neither, so runs degrade to
JSONL+TensorBoard with a one-line notice — same UX as the reference when
``wandb login`` is missing).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class _WandbSink:
    """Scalars/images -> wandb run (``writer.py:304-341`` parity)."""

    def __init__(self, out_dir: Path):
        import wandb  # raises ImportError when absent -> sink skipped

        self._wandb = wandb
        self.run = wandb.init(project="gstex-tpu", dir=str(out_dir),
                              reinit=True)

    def scalars(self, step, values):
        self._wandb.log(dict(values), step=step)

    def image(self, step, name, arr):
        self._wandb.log({name: self._wandb.Image(arr)}, step=step)

    def close(self):
        self.run.finish()


class _CometSink:
    """Scalars/images -> comet experiment (``writer.py:344-389`` parity)."""

    def __init__(self, out_dir: Path):
        import comet_ml

        self.exp = comet_ml.Experiment(project_name="gstex-tpu")

    def scalars(self, step, values):
        self.exp.log_metrics(dict(values), step=step)

    def image(self, step, name, arr):
        self.exp.log_image(arr, name=name, step=step)

    def close(self):
        self.exp.end()


_EXTRA_SINKS = {"wandb": _WandbSink, "comet": _CometSink}


class Writer:
    def __init__(self, out_dir, use_tensorboard: bool = True,
                 console_every: int = 10, vis: str = "tensorboard"):
        """``vis``: comma-separated sink list — any of
        tensorboard / wandb / comet (JSONL + console are always on)."""
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.out_dir / "events.jsonl", "a")
        self.console_every = console_every
        self.tb = None
        kinds = {k.strip() for k in (vis or "").split(",") if k.strip()}
        if use_tensorboard and ("tensorboard" in kinds or not kinds):
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(str(self.out_dir / "tb"))
            except Exception:
                self.tb = None
        self.sinks = []
        for kind in sorted(kinds & set(_EXTRA_SINKS)):
            try:
                self.sinks.append(_EXTRA_SINKS[kind](self.out_dir))
            except Exception as e:  # package missing / not logged in
                print(f"[writer] {kind} unavailable ({type(e).__name__}); "
                      f"continuing with local sinks", flush=True)
        self._t0 = time.time()

    def scalars(self, step: int, values: dict):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in values.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in values.items():
                self.tb.add_scalar(k, float(v), step)
        for sink in self.sinks:
            sink.scalars(step, values)
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
        for sink in self.sinks:
            sink.image(step, name, arr)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
        for sink in self.sinks:
            try:
                sink.close()
            except Exception:
                pass
