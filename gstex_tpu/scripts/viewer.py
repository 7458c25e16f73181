"""gstex-viewer CLI — the ``ns-viewer`` equivalent (eval-mode viewer).

Loads a trained run and serves the interactive viewer without training
(reference ``nerfstudio/scripts/run_viewer.py``).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load-config", required=True)
    p.add_argument("--port", type=int, default=7007)
    args = p.parse_args(argv)

    from .eval_setup import eval_setup

    run_dir = Path(args.load_config)
    if run_dir.name == "config.json":
        run_dir = run_dir.parent
    trainer, method, _ = eval_setup(run_dir)
    trainer.attach_viewer(port=args.port)
    print("viewer running; ctrl-c to exit")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
