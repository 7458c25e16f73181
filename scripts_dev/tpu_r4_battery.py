"""Serialized round-4 perf battery: one process, one variant at a time.

Variants toggled via env are run as subprocesses so module-level env
constants (GSTEX_TABLE_DTYPE, GSTEX_PALLAS_MXU, GSTEX_PALLAS_SKIP)
re-evaluate. Run with NOTHING else using the TPU or the host CPU.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = [
    ("fused-rgb A", {}),
    ("unfused-rgb", {"GSTEX_FUSE_RGB": "0"}),
    ("fused-rgb B", {}),
]

scenes = sys.argv[1:] or ["trained", "dense"]
for name, env in VARIANTS:
    e = dict(os.environ, **env)
    print(f"===== {name} =====", flush=True)
    subprocess.run([sys.executable, os.path.join(HERE, "tpu_steptime.py"),
                    *scenes], env=e, check=False)
