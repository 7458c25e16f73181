"""gstex-eval CLI — the ``ns-eval`` equivalent.

Mirrors ``ComputePSNR`` (reference ``nerfstudio/scripts/eval.py:32-62``):
load a run, compute average eval-image metrics (psnr/ssim/lpips/fps +
gaussian/texel counts), write JSON.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from .eval_setup import eval_setup


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-config", required=True,
                   help="run directory containing config.json")
    p.add_argument("--output-path", default=None)
    p.add_argument("--save-images", action="store_true")
    args = p.parse_args(argv)

    run_dir = Path(args.load_config)
    if run_dir.name == "config.json":
        run_dir = run_dir.parent
    trainer, method, cfg = eval_setup(run_dir)
    results = trainer.eval_all(save_images=args.save_images)
    out = {
        "experiment_name": cfg.get("data"),
        "method_name": method.name,
        "checkpoint": str(run_dir / "checkpoints"),
        "results": results,
    }
    text = json.dumps(out, indent=2)
    if args.output_path:
        Path(args.output_path).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
