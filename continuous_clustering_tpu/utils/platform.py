"""JAX backend robustness helper.

Some environments force an experimental TPU platform via sitecustomize
(prepending it to ``jax_platforms``); when that backend fails to register,
any JAX call raises.  Worse, when the remote-TPU tunnel is wedged (half-up),
backend initialization can HANG indefinitely instead of raising — so the
accelerator is first probed in a bounded subprocess, and only the platforms
that answered are allowed to initialize in this process.  ``ensure_backend()``
falls back to automatic platform selection (ultimately CPU) so CLI tools and
benchmarks keep working on whatever is available.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = (
    "import jax\n"
    "print(jax.devices()[0].platform)\n"
)


def probe_accelerator(timeout_s: float = 60.0) -> str | None:
    """Return the default platform name if the (possibly remote) accelerator
    backend initializes within ``timeout_s``, else None.  Runs in a child
    process so a wedged tunnel cannot hang the caller."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    name = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    return name or None


def ensure_backend(probe_timeout_s: float | None = None) -> str:
    """Initialize a usable JAX backend and return its platform name.

    CCT_PLATFORM=cpu (or any platform name) short-circuits the probe; the
    probe timeout comes from CCT_BACKEND_PROBE_S (default 60, 0 = skip the
    probe and trust in-process initialization like the original helper did).
    """
    import jax

    forced = os.environ.get("CCT_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)
        return jax.devices()[0].platform

    if probe_timeout_s is None:
        probe_timeout_s = float(os.environ.get("CCT_BACKEND_PROBE_S", "60"))
    if probe_timeout_s > 0:
        name = probe_accelerator(probe_timeout_s)
        if name is None:
            # accelerator init hangs or fails in a child: do not let it
            # wedge THIS process — go straight to CPU
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()[0].platform
        if name == "cpu":
            jax.config.update("jax_platforms", "cpu")
            return "cpu"
        # child saw a live accelerator; initialize it here (bounded risk:
        # it answered moments ago)
        return jax.devices()[0].platform

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        try:
            jax.config.update("jax_platforms", "")
            return jax.devices()[0].platform
        except RuntimeError:
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()[0].platform
