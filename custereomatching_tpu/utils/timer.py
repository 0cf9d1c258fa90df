"""Wall-clock timing utilities and a JAX-correct benchmark harness.

The reference's entire profiling subsystem is a wall-clock ``Timer``
context manager (custma/utils.py:13-87) whose CUDA timings are wrong: it
never synchronizes the device, so it measures async launch enqueue, not
kernel runtime (used at examples/verify.py:65-68).  This module provides
the same ergonomics (context manager, ``since_start`` /
``since_last_check``, printf template) written fresh, plus a
:func:`benchmark` harness that does it right for JAX:
``block_until_ready()`` around every measured call, warmup iterations to
exclude compilation, and median-of-N reporting.
"""

from __future__ import annotations

import statistics
import time
from typing import Any, Callable, Dict, Optional

import jax


class TimerError(Exception):
    """Raised when a Timer is queried while not running."""


class Timer:
    """Context-manager wall-clock timer.

    API-compatible with the reference's ``custma.Timer``
    (custma/utils.py:13-87): supports ``with Timer("fwd {:.6f}s"): ...``,
    ``since_start()`` and ``since_last_check()``.

    Note: this measures *host* wall-clock. For device work, pass
    ``sync=jax.block_until_ready``-style callables to :func:`benchmark`
    instead — the reference's misuse of wall-clock timers on async devices
    is exactly the flaw this package avoids.
    """

    def __init__(self, print_tmpl: Optional[str] = None, start: bool = True):
        self._running = False
        if print_tmpl is not None and "{" not in print_tmpl:
            print_tmpl = print_tmpl + " {:.3f}"
        self.print_tmpl = print_tmpl if print_tmpl else "{:.3f}"
        if start:
            self.start()

    @property
    def is_running(self) -> bool:
        return self._running

    def __enter__(self) -> "Timer":
        self.start()
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        print(self.print_tmpl.format(self.since_last_check()))
        self._running = False

    def start(self) -> None:
        if not self._running:
            self._t_start = time.perf_counter()
            self._running = True
        self._t_last = time.perf_counter()

    def since_start(self) -> float:
        if not self._running:
            raise TimerError("timer is not running")
        self._t_last = time.perf_counter()
        return self._t_last - self._t_start

    def since_last_check(self) -> float:
        if not self._running:
            raise TimerError("timer is not running")
        now = time.perf_counter()
        dur = now - self._t_last
        self._t_last = now
        return dur


def benchmark(
    fn: Callable[..., Any],
    *args: Any,
    warmup: int = 2,
    iters: int = 10,
    **kwargs: Any,
) -> Dict[str, float]:
    """Measure a JAX callable correctly.

    Runs ``warmup`` calls (absorbing compilation), then ``iters`` timed
    calls, each fenced with ``jax.block_until_ready`` so device execution —
    not launch enqueue — is measured (fixing the reference's Timer flaw,
    see module docstring).

    Returns a dict with ``median_s``, ``mean_s``, ``min_s``, ``max_s``,
    ``std_s`` and ``iters``.
    """

    def fence(x):
        # block_until_ready alone is not trusted: on relayed/async
        # platforms it can return before execution finishes; a host
        # readback of one element cannot.
        jax.block_until_ready(x)
        leaves = jax.tree_util.tree_leaves(x)
        if leaves and hasattr(leaves[0], "reshape"):
            float(jax.numpy.asarray(leaves[0]).reshape(-1)[0])

    for _ in range(warmup):
        fence(fn(*args, **kwargs))

    # Device execution is in-order, so dispatching a chain of calls and
    # fencing only the last one measures pure device throughput without
    # paying the host↔device round-trip per iteration (which dominates on
    # tunneled platforms).  Each sample is a chain of `chain` calls.
    chain = 4
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn(*args, **kwargs)
        fence(out)
        samples.append((time.perf_counter() - t0) / chain)

    return {
        "median_s": statistics.median(samples),
        "mean_s": statistics.fmean(samples),
        "min_s": min(samples),
        "max_s": max(samples),
        "std_s": statistics.pstdev(samples),
        "iters": float(iters),
    }
