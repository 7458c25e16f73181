"""gstex-export CLI — the ``ns-export`` equivalent.

Mirrors ``nerfstudio/scripts/exporter.py``: ``gstex-ply`` (average-texture
point cloud), ``gstex-npz`` (full parameter dump), plus a round-trippable
2DGS gaussian ply.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from .eval_setup import eval_setup


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["gstex-ply", "gstex-npz", "gaussian-ply"])
    p.add_argument("--load-config", required=True)
    p.add_argument("--output-path", required=True)
    args = p.parse_args(argv)

    run_dir = Path(args.load_config)
    if run_dir.name == "config.json":
        run_dir = run_dir.parent
    trainer, method, _ = eval_setup(run_dir)
    from ..models import init_io

    params = trainer.state.params
    buffers = trainer.state.buffers
    sh = method.model.sh_degree
    if args.kind == "gstex-ply":
        init_io.export_ply(args.output_path, params, buffers, sh)
    elif args.kind == "gstex-npz":
        init_io.export_npz(args.output_path, params, buffers, sh)
    else:
        init_io.export_gaussian_ply(args.output_path, params, buffers, sh)
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
