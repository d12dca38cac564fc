"""JAX backend robustness helper.

Some environments force an experimental TPU platform via sitecustomize
(prepending it to ``jax_platforms``); when that backend fails to register,
any JAX call raises.  ``ensure_backend()`` falls back to automatic platform
selection so CLI tools and benchmarks keep working on whatever is available.
"""

from __future__ import annotations


def ensure_backend() -> str:
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        try:
            jax.config.update("jax_platforms", "")
            return jax.devices()[0].platform
        except RuntimeError:
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()[0].platform
