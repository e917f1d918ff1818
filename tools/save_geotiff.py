#!/usr/bin/env python
"""Run-once geotiff saver: load a SLAM checkpoint (or replay a scan log),
render the map to <base>.png + <base>.tfw, and exit.

The TPU-native equivalent of the reference's standalone saver node
(/root/reference/hector_geotiff/src/geotiff_saver.cpp:121 — a one-shot
node that waits for one map message, writes the geotiff, and exits),
minus ROS: input is a checkpoint file (io/checkpoint.py npz) or a scan
log (io/scanlog.py npz) that gets replayed first.

Usage:
  python tools/save_geotiff.py --checkpoint state.npz --out /tmp/map
  python tools/save_geotiff.py --log scans.npz --out /tmp/map \
      --resolution 0.05 --size 1024 --levels 3
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="SLAM state .npz (io/checkpoint)")
    src.add_argument("--log", help="scan log .npz to replay (io/scanlog)")
    ap.add_argument("--out", required=True,
                    help="output base path (writes <out>.png + <out>.tfw)")
    ap.add_argument("--resolution", type=float, default=0.05)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--no-coords", action="store_true",
                    help="skip the coordinate/scale overlay")
    ap.add_argument("--no-grid", action="store_true",
                    help="skip the 0.5 m explored-space grid")
    args = ap.parse_args(argv)

    import numpy as np
    import hector_slam_tpu as hs
    from hector_slam_tpu.export.geotiff import write_geotiff
    from hector_slam_tpu.export.occupancy import grid_meta, to_occupancy_grid
    from hector_slam_tpu.io.checkpoint import load_state

    cfg = hs.SlamConfig(map=hs.MapConfig(
        resolution=args.resolution, size_x=args.size, size_y=args.size,
        levels=args.levels))

    path_world = None
    if args.checkpoint:
        state = load_state(args.checkpoint, cfg)
    else:
        from hector_slam_tpu.io.scanlog import (load_log, scan_from_ranges,
                                                stack_scans)
        ranges, laser, _ = load_log(args.log)
        scans = stack_scans([
            scan_from_ranges(r, 1.0 / cfg.map.resolution, laser,
                             cfg.max_beams) for r in ranges])
        state = hs.init_state(cfg)
        state, poses, _ = hs.run_log_jit(state, scans, cfg)
        path_world = np.asarray(poses)[:, :2]

    occ = to_occupancy_grid(state.log_odds[0], cfg.update.cell_model)
    meta = grid_meta(cfg.map, level=0)
    png, tfw = write_geotiff(
        occ, meta, args.out, path_world=path_world,
        draw_explored_grid=not args.no_grid,
        draw_coords=not args.no_coords)
    print(f"wrote {png} and {tfw}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
