#!/usr/bin/env python
"""Loaded-vs-idle calibration-probe control (r13 verdict task 2 'done'
criterion): the v2 probe qualifies only if its movement under load
tracks the heavy-query median within ~±10%.

Runs N CPU-hog workers (pure-python spin — the co-tenant signature the
round-13 drift episodes showed) for the duration of a `python bench.py`
child, then exits.  Usage:

    python tools/bench_load_control.py [n_workers] -- python bench.py

The hogs are nice(19)'d so the experiment models background co-tenant
load, not a starvation attack.
"""

from __future__ import annotations

import os
import subprocess
import sys


def _spin() -> None:
    os.nice(19)
    x = 0
    while True:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def main() -> None:
    argv = sys.argv[1:]
    sep = argv.index("--")
    n = int(argv[0]) if sep >= 1 else 16
    cmd = argv[sep + 1:]
    import multiprocessing as mp
    hogs = [mp.Process(target=_spin, daemon=True) for _ in range(n)]
    for h in hogs:
        h.start()
    try:
        sys.exit(subprocess.call(cmd))
    finally:
        for h in hogs:
            h.terminate()


if __name__ == "__main__":
    main()
