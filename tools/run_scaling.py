"""Run only the bench scaling probe (N vs 4N evidence) and print its JSON.

Usage: python tools/run_scaling.py
Env: SPARK_GRAFT_SCALE_PAIRS / _LO / _HI / _TRIALS / _REPLICATE as in bench.py.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench

if __name__ == "__main__":
    print(json.dumps(bench.run_scaling()))
