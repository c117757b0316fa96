"""Bounded JAX backend discovery.

The axon TPU relay occasionally drops for a few minutes. ``jax.devices()``
against a dropped relay can HANG (observed >160s), not just raise — so the
probe is bounded with SIGALRM. Shared by ``bench.py`` and
``__graft_entry__.py``, whose retry *policies* differ (re-exec vs sleep +
clear_backends) but whose probe must not: a relay-behavior fix applied to
one entry point only would leave the other hanging on the same transient.
"""

from __future__ import annotations

import signal


def bounded_devices(timeout_s: int = 240):
    """Run ``jax.devices()`` with a SIGALRM deadline.

    Returns the device list on success. Raises ``TimeoutError`` when
    discovery hangs past ``timeout_s``, or whatever ``RuntimeError`` the
    backend raised. Main-thread only (SIGALRM), which both entry points are.
    """
    import jax

    def _timeout(signum, frame):
        raise TimeoutError(
            f"backend discovery timed out after {timeout_s}s")

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(timeout_s)
    try:
        return jax.devices()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
