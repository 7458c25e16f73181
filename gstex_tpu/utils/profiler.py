"""Wall-time profiler: running-average table per labeled section.

The analog of the reference's "basic" profiler
(``nerfstudio/utils/profiler.py:53-116``) — a decorator/context that
accumulates mean wall time per function and prints a sorted table at exit.
The "pytorch profiler" tier maps to ``jax.profiler.trace`` traces
(``start_trace``/``stop_trace`` here).
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict

_TIMES: dict[str, list] = defaultdict(lambda: [0.0, 0])


@contextlib.contextmanager
def time_section(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = _TIMES[name]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1


def time_function(fn):
    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with time_section(fn.__qualname__):
            return fn(*a, **kw)

    return wrapper


def summary() -> str:
    rows = sorted(_TIMES.items(), key=lambda kv: -kv[1][0])
    lines = [f"{'section':40s} {'total_s':>10s} {'calls':>8s} {'mean_ms':>10s}"]
    for name, (total, calls) in rows:
        lines.append(f"{name:40s} {total:10.2f} {calls:8d} "
                     f"{1000 * total / max(calls, 1):10.2f}")
    return "\n".join(lines)


def reset():
    _TIMES.clear()


def start_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax

    jax.profiler.stop_trace()
