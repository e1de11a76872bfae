"""CLI: golden-checkpoint replay verification (≙ /root/reference/tool/
perf.cu: load the checkpoint triple, run every per-stage verification,
print pass/fail; per-stage jitted programs are the profiler targets).

Usage: python -m sift_tpu.tools.perf CHECKPOINT_DIR [--stage NAME]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path", help="checkpoint directory (params/input/expected)")
    p.add_argument("--stage", default=None,
                   help="run only this stage (filter, resize, minus, "
                        "find_peaks, adjust_pts, orientation_hist, "
                        "descriptor)")
    args = p.parse_args(argv)

    from sift_tpu.perf.checkpoint import load_golden
    from sift_tpu.perf.replay import Replayer

    params, inputs, expected = load_golden(args.path)
    rep = Replayer(params, inputs, expected)

    stages = [args.stage] if args.stage else list(Replayer.ALL)
    all_ok = True
    for name in stages:
        ok, info = getattr(rep, f"run_{name}")()
        all_ok &= bool(ok)
        print(f"{'PASS' if ok else 'FAIL'}  {name:18s} {info}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
