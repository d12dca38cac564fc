"""Device profiling helpers.

The reference's profiling story is queue-depth sampling + wall clocks
(SURVEY.md §5).  On TPU the equivalent first-class tool is an xplane trace:
wrap any streaming section in ``trace()`` and open the result in
TensorBoard/XProf; ``annotate()`` marks host-side stages so they line up
with device timelines.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cct_trace"):
    """Capture a JAX profiler trace around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host annotation visible in the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
