"""Numerical-failure detection: checkify + NaN debugging helpers.

The reference has no sanitizer story at all — kernel errors are printed
and execution continues (``TEST_Dungeonrun/Trixel.cu:227-237``,
``vector.cuh:15-18``); SURVEY.md §5 names the JAX-native equivalents:
interpret-vs-compiled Pallas parity (tests/test_pallas_kernel.py,
PARITY_r04.json), ``jax.config.jax_debug_nans``, and ``checkify``. This
module supplies the last two as first-class debug entry points:

- `checked_render` — run a full frame under ``checkify`` float checks
  (NaN/Inf produced anywhere in the traced XLA graph raises a structured
  error instead of silently propagating into the framebuffer). Pallas
  kernel bodies are opaque to checkify; their outputs ARE checked as
  soon as standard ops consume them, which is where a kernel NaN would
  surface.
- `debug_nans` — context manager for ``jax_debug_nans`` (eager NaN
  detection with op-level provenance, the heavier hammer for localizing
  a NaN that checked_render reported).
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


def checked_render(scene, camera, config, accel=None):
    """Render one frame under checkify float checks.

    Returns ``(error, RenderOutput)``; ``error.get()`` is None for a
    clean frame, else a message naming the first failing check. Usage::

        err, frame = checked_render(scene, camera, config)
        err.throw()   # raises ValueError on NaN/Inf anywhere in the frame
    """
    from ..models.renderer import render

    def fn(s, c):
        return render(s, c, config, accel)

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    return jax.jit(checked)(scene, camera)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped ``jax_debug_nans``: any op producing NaN raises
    FloatingPointError at the producing primitive."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
