"""TPU backend bring-up helpers shared by the benchmark CLIs.

The tunneled TPU backend on this runtime occasionally fails its first
initialization with a transient UNAVAILABLE; every benchmark entry point
retries through `wait_for_backend` before giving up on the run.
"""

from __future__ import annotations

import sys
import time


def wait_for_backend(tries: int = 5, delay_s: float = 45.0) -> None:
    """Retry `jax.devices()` until the backend comes up (or raise)."""
    import jax

    for i in range(tries):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if i == tries - 1:
                raise
            print(f'# backend init failed ({e}); retry {i + 1}/{tries} '
                  f'in {delay_s:.0f}s', file=sys.stderr, flush=True)
            from jax._src import api as _api
            _api.clear_backends()
            time.sleep(delay_s)
