"""Pick the winning CC knob set from a banked r4c battery output.

Reads JSON lines from the battery log (default /tmp/battery_r4c.out),
computes min-over-scenes per tag, picks the argmax, and prints
``export K=V`` lines for that tag's env so a shell session can apply the
winner to the subsequent bench/contract runs:

    eval "$(python scripts/pick_knobs.py)"

Ties / missing scenes / overflow rows are handled conservatively: a tag
must have a clean measurement on every scene to be eligible.  If no tag
qualifies, prints nothing (exit 0) so the session continues at shipped
defaults.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_experiments_r4c import KNOBS as _KNOBS_R4C  # noqa: E402
from tpu_experiments_r5b import KNOBS as _KNOBS_R5B  # noqa: E402
from tpu_experiments_r5c import KNOBS as _KNOBS_R5C  # noqa: E402

# later batteries shadow same-named earlier tags (the only overlaps are
# re-measured anchors/finalists with identical env)
KNOBS = {**_KNOBS_R4C, **_KNOBS_R5B, **_KNOBS_R5C}

SCENES = {"standard", "near_field", "clutter"}


def pick(path):
    per_tag = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ("tag" in r and "scene" in r and "pts_per_s" in r
                        and not r.get("overflow") and not r.get("cc_failed")
                        and "error" not in r):
                    per_tag.setdefault(r["tag"], {})[r["scene"]] = r["pts_per_s"]
    except FileNotFoundError:
        return None, None
    best, best_min = None, -1.0
    for tag, d in per_tag.items():
        if set(d) >= SCENES and tag in KNOBS:
            m = min(d[s] for s in SCENES)
            if m > best_min:
                best, best_min = tag, m
    return best, best_min


def main():
    argv = [a for a in sys.argv[1:] if a != "--tag"]
    tag_only = "--tag" in sys.argv[1:]
    path = argv[0] if argv else "/tmp/battery_r4c.out"
    best, best_min = pick(path)
    if tag_only:
        # bare winning tag for shell logic (empty = no eligible tag);
        # the session uses this to skip re-measuring when the chip picked
        # the shipped defaults ("hs") and default-knob artifacts are banked
        print(best or "")
        return 0
    if best is None:
        print("# pick_knobs: no eligible tag; keeping shipped defaults",
              file=sys.stderr)
        return 0
    print(f"# pick_knobs: {best} min-over-scenes {best_min:.0f} pts/s",
          file=sys.stderr)
    for k, v in KNOBS[best].items():
        print(f"export {k}={v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
