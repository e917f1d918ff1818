"""Generates the committed realistic-log fixture
tests/fixtures/corridor_utm30lx.npz.

The reference ships NO recorded data (SURVEY.md §4: no bags, no fixtures;
its validation culture was replaying UTM-30LX logs by hand,
hector_slam_launch/launch/*_logfile_processing.launch). This synthesizes
the closest reproducible equivalent: a long (~450-scan) 1081-beam
UTM-30LX log through an L-shaped corridor with

  - grazing-incidence returns along the long walls,
  - box/pillar clutter,
  - a 90-degree turn (sustained rotation),
  - random per-beam dropouts (2%, specular surfaces / absorbers),
  - Gaussian range noise (sigma 1 cm),
  - max-range no-returns at the open far end (filtered like the node's
    range window, HectorMappingRos.cpp:96-102).

Deterministic (fixed seeds), so the committed .npz is reproducible from
this script: python tools/make_fixture.py [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from hector_slam_tpu.io.scanlog import LaserModel, save_log  # noqa: E402
from hector_slam_tpu.io.simulator import (World, l_corridor_trajectory,  # noqa: E402
                                          simulate_trajectory)

DROPOUT_P = 0.02
NOISE_STD = 0.01
SEED = 12345


def make(path: str) -> None:
    laser = LaserModel()  # 1081 beams, 270 deg, 30 m
    world = World.l_corridor()
    poses = l_corridor_trajectory(advance=0.05, weave=0.03)
    ranges = simulate_trajectory(world, poses, laser,
                                 range_noise_std=NOISE_STD, seed=SEED)
    rng = np.random.default_rng(SEED + 1)
    dropouts = rng.random(ranges.shape) < DROPOUT_P
    ranges = np.where(dropouts, np.float32(0.0), ranges)  # < range_min
    save_log(path, ranges, poses_true=poses, laser=laser)
    print(f"wrote {path}: {ranges.shape[0]} scans x {ranges.shape[1]} "
          f"beams, {dropouts.mean():.1%} dropouts")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "corridor_utm30lx.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    make(out)
