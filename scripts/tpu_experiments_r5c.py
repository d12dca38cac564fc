"""Round-5c TPU battery: SAME-SESSION confirm of the r5b finalists.

The r5b waves ran in two calibration sessions (fixed 28.1 ms vs 32.9 ms;
~2-3% between-session drift, docs/ROUND4_NOTES.md), so the cross-wave
ordering of the two leaders was never measured under one calibration:

  wave 1: hsvs1j0_u4  min-over-scenes 6.64M  (anchor hsvsj0 6.15M)
  wave 2: hsvs1j0_u8  min-over-scenes 6.77M  (no anchor in session)

This battery re-measures the shipped default (hsvsj0) and both leaders
under ONE calibration; the winner ships as the round-5 defaults.

Usage: python scripts/tpu_experiments_r5c.py [resume_path]
"""

import sys

from tpu_experiments_r5b import run_battery

KNOBS = {
    # shipped round-5 default (r4c winner): both scans every round, jump-free
    "hsvsj0": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
               "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0",
               "CCT_GSEG_UNROLL": "1"},
    # wave-1 leader: column scan staggered to round >=1, ground-seg unroll 4
    "hsvs1j0_u4": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                   "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1",
                   "CCT_GSEG_UNROLL": "4"},
    # wave-2 leader: same CC schedule, unroll 8
    "hsvs1j0_u8": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                   "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1",
                   "CCT_GSEG_UNROLL": "8"},
}


def main():
    resume = sys.argv[1] if len(sys.argv) > 1 else ""
    return run_battery(KNOBS, resume)


if __name__ == "__main__":
    raise SystemExit(main())
