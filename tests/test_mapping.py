"""Map update: closed-form Bresenham + scatter vs the oracle's exact serial
transcription (OccGridMapBase.h:121-260). These must agree cell-for-cell
and (given identical poses) bit-for-bit in log-odds: the update arithmetic
is order-free masked adds."""

import numpy as np
import jax.numpy as jnp

from hector_slam_tpu.config import MapConfig, SlamConfig, UpdateConfig
from hector_slam_tpu.core.mapping import rasterize_scan, update_level, update_pyramid
from hector_slam_tpu.oracle import oracle_np as on
from hector_slam_tpu.types import Scan


def _mk_scan(points, origo, n_pad=64):
    pts = np.zeros((n_pad, 2), np.float32)
    pts[: len(points)] = points
    mask = np.zeros(n_pad, bool)
    mask[: len(points)] = True
    return (jnp.asarray(pts), jnp.asarray(np.asarray(origo, np.float32)),
            jnp.asarray(mask))


def _oracle_map(size=64, res=0.1):
    off = (res * size * 0.5, res * size * 0.5)
    return on.OracleMap(size, size, res, off), off


def test_single_beam_cells_match_oracle():
    """Compare the rasterized free/occ sets against the oracle's update for
    assorted beam geometries incl. steep/shallow/diagonal/negative dirs."""
    for end in [(5.3, 0.2), (0.3, 7.8), (6.0, 6.0), (-4.2, -1.1),
                (-0.4, 5.9), (2.5, -6.5), (1.0, 0.0), (0.0, 1.0),
                (7.9, 3.3), (-7.7, 2.9)]:
        m, off = _oracle_map()
        pose = np.array([0.1, -0.2, 0.35], np.float32)
        pts = np.array([end], np.float32) / 0.1  # map-scale units
        on.update_by_scan(m, pts, np.zeros(2, np.float32), pose)

        p, o, mask = _mk_scan(pts, (0.0, 0.0))
        free_set, occ_set, _ = rasterize_scan(
            (64, 64), jnp.asarray(pose), p, o, mask, off, 10.0, 256)
        lo_f = np.float32(m.log_odds_free)
        lo_o = np.float32(m.log_odds_occupied)
        want_free = np.isclose(m.log_odds, lo_f)
        want_occ = np.isclose(m.log_odds, lo_o)
        np.testing.assert_array_equal(np.asarray(free_set) & ~np.asarray(occ_set),
                                      want_free, err_msg=str(end))
        np.testing.assert_array_equal(np.asarray(occ_set), want_occ,
                                      err_msg=str(end))


def test_full_scan_update_bitexact_vs_oracle():
    rng = np.random.default_rng(3)
    m, off = _oracle_map()
    pose = np.array([0.4, 0.3, 1.1], np.float32)
    angles = rng.uniform(-np.pi, np.pi, 120)
    ranges = rng.uniform(0.5, 5.5, 120)
    pts = (np.stack([np.cos(angles) * ranges, np.sin(angles) * ranges],
                    axis=-1) / 0.1).astype(np.float32)
    origo = np.array([0.05, -0.03], np.float32) / 0.1
    on.update_by_scan(m, pts, origo, pose)

    p, o, mask = _mk_scan(pts, origo, n_pad=128)
    got, _ = update_level(jnp.zeros((64, 64), jnp.float32), jnp.asarray(pose),
                          p, o, mask, off, 10.0, 256,
                          float(m.log_odds_free), float(m.log_odds_occupied))
    np.testing.assert_array_equal(np.asarray(got), m.log_odds)


def test_occupied_overrides_free_and_dedup():
    """Two beams: one passes through cell C (free), other ends at C (occ).
    C must get exactly the occupied delta; shared free cells counted once
    (OccGridMapBase.h:216-241)."""
    m, off = _oracle_map(size=32)
    pose = np.zeros(3, np.float32)
    # beam 1 passes through (20,16) to (24,16); beam 2 ends at (20,16)
    # map coords: origin maps to (16,16)
    pts = np.array([[8.0, 0.0], [4.0, 0.0]], np.float32)
    on.update_by_scan(m, pts, np.zeros(2, np.float32), pose)
    assert np.isclose(m.log_odds[16, 20], m.log_odds_occupied)

    p, o, mask = _mk_scan(pts, (0.0, 0.0))
    got, _ = update_level(jnp.zeros((32, 32), jnp.float32), jnp.asarray(pose),
                          p, o, mask, off, 10.0, 256,
                          float(m.log_odds_free), float(m.log_odds_occupied))
    np.testing.assert_array_equal(np.asarray(got), m.log_odds)


def test_occ_clamp_at_50():
    """Cells at logOdds >= 50 receive no occupied delta
    (GridMapLogOdds.h:135-140) but free still applies."""
    m, off = _oracle_map(size=32)
    m.log_odds[16, 20] = 55.0
    lo0 = jnp.asarray(m.log_odds.copy())
    pose = np.zeros(3, np.float32)
    pts = np.array([[4.0, 0.0]], np.float32)  # ends at (20,16)
    on.update_by_scan(m, pts, np.zeros(2, np.float32), pose)
    assert m.log_odds[16, 20] == 55.0

    p, o, mask = _mk_scan(pts, (0.0, 0.0))
    got, _ = update_level(lo0, jnp.asarray(pose), p, o, mask, off, 10.0, 256,
                          float(m.log_odds_free), float(m.log_odds_occupied))
    np.testing.assert_array_equal(np.asarray(got), m.log_odds)


def test_out_of_bounds_beams_skipped():
    """A beam whose endpoint leaves the map is skipped entirely — no free
    marking along the way (OccGridMapBase.h:186)."""
    m, off = _oracle_map(size=32)
    pose = np.zeros(3, np.float32)
    pts = np.array([[100.0, 0.0]], np.float32)  # way outside
    on.update_by_scan(m, pts, np.zeros(2, np.float32), pose)
    assert (m.log_odds == 0.0).all()

    p, o, mask = _mk_scan(pts, (0.0, 0.0))
    got, _ = update_level(jnp.zeros((32, 32), jnp.float32), jnp.asarray(pose),
                          p, o, mask, off, 10.0, 256,
                          float(m.log_odds_free), float(m.log_odds_occupied))
    assert (np.asarray(got) == 0.0).all()


def test_same_cell_beam_skipped():
    """start==end cell -> no update at all (OccGridMapBase.h:158)."""
    m, off = _oracle_map(size=32)
    pts = np.array([[0.2, 0.1]], np.float32)
    on.update_by_scan(m, pts, np.zeros(2, np.float32), np.zeros(3, np.float32))
    assert (m.log_odds == 0.0).all()
    p, o, mask = _mk_scan(pts, (0.0, 0.0))
    got, _ = update_level(jnp.zeros((32, 32), jnp.float32), jnp.zeros(3, jnp.float32),
                          p, o, mask, off, 10.0, 256,
                          float(m.log_odds_free), float(m.log_odds_occupied))
    assert (np.asarray(got) == 0.0).all()


def test_pyramid_update_levels_independent():
    """Each level integrates its own scaled scan (MapRepMultiMap.h:134-147).
    Validate all 3 levels against per-level oracles."""
    cfg = SlamConfig(map=MapConfig(resolution=0.1, size_x=64, size_y=64,
                                   levels=3),
                     update=UpdateConfig(),
                     max_ray_cells=128)
    mm = on.OracleMultiMap(0.1, 64, 64, 3, free_factor=0.4,
                           occupied_factor=0.9)
    rng = np.random.default_rng(9)
    angles = rng.uniform(-np.pi, np.pi, 60)
    ranges = rng.uniform(0.5, 2.8, 60)
    pts = (np.stack([np.cos(angles) * ranges, np.sin(angles) * ranges],
                    axis=-1) / 0.1).astype(np.float32)
    pose = np.array([0.2, -0.1, 0.4], np.float32)
    mm.update_by_scan(pts, np.zeros(2, np.float32), pose)

    p, o, mask = _mk_scan(pts, (0.0, 0.0), n_pad=64)
    scan = Scan(points=p, origo=o, mask=mask)
    pyramid = tuple(jnp.zeros((64 >> i, 64 >> i), jnp.float32)
                    for i in range(3))
    got, _ = update_pyramid(pyramid, jnp.asarray(pose), scan, cfg)
    for lvl in range(3):
        np.testing.assert_array_equal(
            np.asarray(got[lvl]), mm.maps[lvl].log_odds,
            err_msg=f"level {lvl}")


def test_long_beam_no_truncation_under_auto_cap():
    """A beam with dominant-axis span > a small explicit cap silently
    diverged from the reference in round 1 (VERDICT weak #1). Under the
    default auto cap (max_ray_cells=0 -> max(size)) every in-map cell is
    marked, bit-exact vs the oracle; under a too-small explicit cap the
    dropped cells are counted in the returned metric."""
    size, res = 128, 0.1
    off = (res * size * 0.5, res * size * 0.5)
    m = on.OracleMap(size, size, res, off)
    # start near the map corner so a ~118-cell beam stays in-map
    pose = np.array([-5.9, -5.9, 0.0], np.float32)
    # beam spanning ~118 cells along x: abs_da ~ 118
    pts = np.array([[118.0, 31.0]], np.float32)
    on.update_by_scan(m, pts, np.zeros(2, np.float32), pose)
    p, o, mask = _mk_scan(pts, (0.0, 0.0))

    # auto cap (== size): bit-exact, zero truncation
    cfg = SlamConfig(map=MapConfig(resolution=res, size_x=size, size_y=size,
                                   levels=1))
    assert cfg.resolved_max_ray_cells == size
    got, trunc = update_level(
        jnp.zeros((size, size), jnp.float32), jnp.asarray(pose), p, o, mask,
        off, 1.0 / res, cfg.level_max_ray_cells(0),
        float(m.log_odds_free), float(m.log_odds_occupied))
    np.testing.assert_array_equal(np.asarray(got), m.log_odds)
    assert int(trunc) == 0

    # explicit small cap: truncation is counted, not silent
    got2, trunc2 = update_level(
        jnp.zeros((size, size), jnp.float32), jnp.asarray(pose), p, o, mask,
        off, 1.0 / res, 32,
        float(m.log_odds_free), float(m.log_odds_occupied))
    assert int(trunc2) == 118 - 32  # abs_da - K dropped cells
    assert (np.asarray(got2) != m.log_odds).any()


def test_seg_raster_bitexact_vs_dense_scatter():
    """The segment-compacted rasterization (rasterize_scan_seg) must
    produce bit-identical free/occupied cell sets to the dense-slot
    path — including beam validity, rounding, the truncation counter,
    and the budget-overflow dense fallback. The dense path is itself
    pinned against the compiled reference, so transitivity pins the
    compacted path."""
    from hector_slam_tpu.core.mapping import rasterize_scan_seg
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    cfg = SlamConfig(map=MapConfig(resolution=0.05, size_x=256, size_y=256,
                                   levels=1), max_ray_cells=256)
    laser = LaserModel(num_beams=271, angle_min=-2.356,
                       angle_increment=4 * 0.004363,
                       range_min=0.1, range_max=12.0)
    world = World.corridor(length=8.0, width=3.0)
    poses = corridor_trajectory(4, advance=0.06, weave=0.03)
    ranges = simulate_trajectory(world, poses, laser)
    shape = (256, 256)
    for k_cap in (256, 40):   # 40 forces truncation on long beams
        for budget in (0, 4):   # 4 segments forces the overflow fallback
            for p_, r in zip(poses, ranges):
                sc = scan_from_ranges(r, cfg.map.level_scale(0), laser,
                                      cfg.max_beams)
                args = (shape, jnp.asarray(p_), sc.points, sc.origo,
                        sc.mask, cfg.map.top_left_offset,
                        cfg.map.level_scale(0), k_cap)
                f1, o1, t1 = rasterize_scan(*args)
                f2, o2, t2 = rasterize_scan_seg(*args,
                                                budget_segments=budget)
                assert np.array_equal(np.asarray(f1), np.asarray(f2))
                assert np.array_equal(np.asarray(o1), np.asarray(o2))
                assert int(t1) == int(t2)


def test_update_pyramid_seg_backend_bitexact():
    """update_pyramid(raster_backend="seg") == "xla" on every level,
    and empty scans are no-ops on both."""
    from hector_slam_tpu.core.slam import init_state
    from hector_slam_tpu.io.scanlog import LaserModel, scan_from_ranges
    from hector_slam_tpu.io.simulator import (World, corridor_trajectory,
                                              simulate_trajectory)
    cfg = SlamConfig(map=MapConfig(resolution=0.05, size_x=256, size_y=256,
                                   levels=2), max_ray_cells=256)
    laser = LaserModel(num_beams=271, angle_min=-2.356,
                       angle_increment=4 * 0.004363,
                       range_min=0.1, range_max=12.0)
    world = World.corridor(length=8.0, width=3.0)
    poses = corridor_trajectory(2, advance=0.06, weave=0.03)
    ranges = simulate_trajectory(world, poses, laser)
    st = init_state(cfg)
    sc = scan_from_ranges(ranges[0], cfg.map.level_scale(0), laser,
                          cfg.max_beams)
    p1, t1 = update_pyramid(st.log_odds, jnp.asarray(poses[0]), sc, cfg,
                            raster_backend="xla")
    p2, t2 = update_pyramid(st.log_odds, jnp.asarray(poses[0]), sc, cfg,
                            raster_backend="seg")
    for a, b in zip(p1, p2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(t1) == int(t2)

    empty = Scan(points=jnp.zeros_like(sc.points), origo=sc.origo,
                 mask=jnp.zeros_like(sc.mask))
    p3, _ = update_pyramid(st.log_odds, jnp.asarray(poses[0]), empty, cfg,
                           raster_backend="seg")
    for a, b in zip(st.log_odds, p3):
        assert np.array_equal(np.asarray(a), np.asarray(b))
