"""MXU dot precision A/B: HIGHEST (6-pass) vs HIGH (3-pass) kernel timing."""
import subprocess
import sys

for prec in ("highest", "high"):
    print(f"--- GSTEX_PALLAS_MXU_PREC={prec}", flush=True)
    subprocess.run(
        [sys.executable, "scripts_dev/tpu_fwd_split.py"],
        env={**__import__("os").environ, "GSTEX_PALLAS_MXU_PREC": prec},
        check=True)
    subprocess.run(
        [sys.executable, "scripts_dev/tpu_bwd_split.py"],
        env={**__import__("os").environ, "GSTEX_PALLAS_MXU_PREC": prec},
        check=True)
