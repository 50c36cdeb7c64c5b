"""Central backend dispatch for the fused Pallas paths.

Every hot-path branch that picks a Pallas kernel over the XLA fallback
funnels through :func:`use_fused` so the branches are CPU-testable: under
``force_fused()`` the TPU branches run in Pallas *interpret* mode on any
backend, and pytest can assert bit-agreement against the XLA path.  A
dead dispatch branch (like the one fixed in commit d51daea, which sat
after an unconditional return and silently fell back for a whole round)
now fails CI instead of waiting for a bench run.

The production gate is unchanged: real TPU -> compiled Pallas kernels,
everything else -> XLA.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

_FORCE_FUSED = False


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def use_fused() -> bool:
    """True when rank/SpMM dispatch should take the fused Pallas branch."""
    return _FORCE_FUSED or on_tpu()


def interpret_mode() -> bool:
    """True when the fused branch must run the kernel in interpret mode
    (forced-fused on a non-TPU backend, i.e. under tests)."""
    return _FORCE_FUSED and not on_tpu()


@contextmanager
def force_fused():
    """Route all fused-dispatch branches through the Pallas kernels in
    interpret mode regardless of backend (test-only; interpret mode is
    orders of magnitude slower than both real paths)."""
    global _FORCE_FUSED
    prev = _FORCE_FUSED
    _FORCE_FUSED = True
    try:
        yield
    finally:
        _FORCE_FUSED = prev
