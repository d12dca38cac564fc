"""Build the native library: python -m continuous_clustering_tpu.native.build"""

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = False) -> Path:
    here = Path(__file__).parent
    build_dir = here / "build"
    build_dir.mkdir(exist_ok=True)
    kw = {} if verbose else {"capture_output": True, "text": True}
    r = subprocess.run(
        ["cmake", "-S", str(here), "-B", str(build_dir), "-G", "Ninja"], **kw
    )
    if r.returncode != 0:
        raise RuntimeError(f"cmake configure failed:\n{getattr(r, 'stderr', '')}")
    r = subprocess.run(["ninja", "-C", str(build_dir)], **kw)
    if r.returncode != 0:
        raise RuntimeError(f"build failed:\n{getattr(r, 'stderr', '')}")
    out = here / "lib" / "libcct_native.so"
    if not out.exists():
        raise RuntimeError(f"build produced no library at {out}")
    return out


if __name__ == "__main__":
    print(build(verbose="-q" not in sys.argv))
