"""Multi-process worker for the cross-process fleet-step test.

Launched (twice) by tests/test_multiprocess.py:
    python tools/mp_worker.py <process_id> <num_processes> <port> <out.npz>

Each process owns 8/num_processes virtual CPU devices; jax.distributed stitches them
into one 8-device global mesh, so the 'robot' axis of the
('robot','beam') mesh spans a process boundary — the single-program
equivalent of the reference's cross-host deployment (SURVEY.md §4
"Multi-host without a cluster", §2.4 comms row). Every process computes
the same deterministic fleet inputs, contributes its addressable shards,
runs the sharded step, and process 0 writes the gathered result for the
test to compare against the single-process ground truth.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # 8 global devices regardless of process count, so the mesh (and the
    # partitioned program) is identical for the 1- and 2-process runs
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hector_slam_tpu.config import MapConfig, SlamConfig
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges, stack_scans
    from hector_slam_tpu.io.simulator import World, raycast
    from hector_slam_tpu.parallel.batch import init_fleet
    from hector_slam_tpu.parallel.sharded import (_scan_specs, _state_specs,
                                                  make_fleet_step, make_mesh)
    from jax.sharding import NamedSharding

    assert len(jax.devices()) == 8, jax.devices()

    cfg = SlamConfig(
        map=MapConfig(resolution=0.1, size_x=64, size_y=64, levels=2),
        max_beams=128, max_ray_cells=64,
    )
    mesh = make_mesh(8)   # ('robot', 'beam') over all processes
    R = mesh.devices.shape[0] * 2

    laser = LaserModel(num_beams=91, angle_min=-1.57,
                       angle_increment=0.0349, range_min=0.1, range_max=5.0)
    world = World.room(size=5.0)
    scale = cfg.map.level_scale(0)
    rng = np.random.default_rng(7)  # identical on every process
    scans = stack_scans([
        scan_from_ranges(
            raycast(world, np.array([0.0, 0.0, rng.uniform(-0.1, 0.1)]),
                    laser),
            scale, laser, cfg.max_beams)
        for _ in range(R)])
    fleet = init_fleet(cfg, R)

    def globalize(tree, specs):
        def one(x, spec):
            x = np.asarray(x)
            sharding = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
        return jax.tree.map(one, tree, specs,
                            is_leaf=lambda v: v is None)

    fleet_g = globalize(fleet, _state_specs(cfg))
    scans_g = globalize(scans, _scan_specs())

    step = make_fleet_step(mesh, cfg)
    new_fleet, metrics = step(fleet_g, scans_g)

    poses = multihost_utils.process_allgather(new_fleet.pose,
                                              tiled=True)
    lo0 = multihost_utils.process_allgather(new_fleet.log_odds[0],
                                            tiled=True)
    updated = multihost_utils.process_allgather(metrics.map_updated,
                                                tiled=True)
    if pid == 0:
        np.savez(out_path, poses=np.asarray(poses), lo0=np.asarray(lo0),
                 updated=np.asarray(updated))
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
