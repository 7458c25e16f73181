"""gstex-dev-test — the local CI driver.

The analog of the reference's ``scripts/github/run_actions.py`` (which runs
its lint + pytest actions locally before a push): runs the fast pytest
tier by default, ``--full`` adds the slow tier, ``--compile-check`` runs
the driver entry compile checks (single-chip jit + the 8-device virtual
multichip dryrun).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def _run(name, cmd, env=None):
    print(f"[dev-test] {name}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, env=env)
    if r.returncode != 0:
        print(f"[dev-test] {name} FAILED (rc={r.returncode})")
        return False
    print(f"[dev-test] {name} passed")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--full", action="store_true",
                   help="include the slow test tier (-m '')")
    p.add_argument("--compile-check", action="store_true",
                   help="run the single-chip entry jit + 8-device virtual "
                        "multichip dryrun")
    p.add_argument("-k", default=None, help="pytest -k filter")
    args = p.parse_args(argv)

    ok = True
    pytest_cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if args.full:
        pytest_cmd += ["-m", ""]
    if args.k:
        pytest_cmd += ["-k", args.k]
    ok &= _run("pytest", pytest_cmd)

    if args.compile_check:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import __graft_entry__ as e;"
            "fn, ex = e.entry(); jax.jit(fn)(*ex);"
            "e.dryrun_multichip(8); print('compile checks ok')"
        )
        ok &= _run("compile-check", [sys.executable, "-c", code], env=env)

    if not ok:
        raise SystemExit(1)
    print("[dev-test] all green")


if __name__ == "__main__":
    main()
