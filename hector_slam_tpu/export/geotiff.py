"""Georeferenced map export — the hector_geotiff equivalent.

Renders the occupancy grid + trajectory to an RGB image with the same
layout/georeferencing math as GeotiffWriter
(hector_geotiff/src/geotiff_writer/geotiff_writer.cpp) and writes
``<name>.png`` + ``<name>.tfw`` (world file). PNG replaces Qt's TIFF
writer (same pixels, no Qt dependency); the .tfw lines are computed with
the reference's exact float math so the georeference is identical.

Layout math citations (into geotiff_writer.cpp):
  - setupTransforms :115-185 — resolutionFactor 3, margins 1 m
    right/bottom and 3 m left/top, total size ceil'd to whole meters,
    chained world<->map<->geotiff linear transformers
  - transformPainterToImgCoords :620-625 — the painter is rotated -90 and
    y-flipped, so geo (x, y) lands at image (col = yMax - y,
    row = xMax - x) and the image is (yMaxGeo x xMaxGeo) in Qt's
    (width x height)
  - drawBackgroundCheckerboard :269-320 — 1 m checker tiles
    (226,226,227)/(237,237,238) on grey 128
  - drawMap :322-415 — free white, occupied (0,40,120), explored-space
    grid lines (190,190,191) every 0.5 m across free cells
  - drawPath :481-522 — width-3 polyline, default color (120,0,240)
  - writeGeotiffImage :529-618 — .tfw: [res/3, 0, 0, -(res/3),
    -world_y(corner), world_x(corner)] with corner = geo pixel
    (sizePixels+1); the x/y swap reflects the rotated image
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from .images import write_png
from .occupancy import GridMeta, map_extends

F32 = np.float32

GREY = (128, 128, 128)
CHECKER_A = (226, 226, 227)
CHECKER_B = (237, 237, 238)
FREE = (255, 255, 255)
OCCUPIED = (0, 40, 120)
EXPLORED_GRID = (190, 190, 191)
PATH_COLOR = (120, 0, 240)  # trajectory plugin default


@dataclasses.dataclass
class LinTransform2D:
    """CoordinateTransformer (HectorMapTools.h:41-116): out = origo +
    in * scale per axis; fit from two point pairs exactly like
    setTransformsBetweenCoordSystems (:67-82)."""

    origo: np.ndarray
    scale: np.ndarray

    @staticmethod
    def fit(p1_in, p2_in, p1_out, p2_out) -> "LinTransform2D":
        p1_in = np.asarray(p1_in, np.float32)
        p2_in = np.asarray(p2_in, np.float32)
        p1_out = np.asarray(p1_out, np.float32)
        p2_out = np.asarray(p2_out, np.float32)
        scale = (p1_out - p2_out) / (p1_in - p2_in)
        origo = p1_out - p1_in * scale
        return LinTransform2D(origo, scale)

    def fwd(self, p) -> np.ndarray:
        return self.origo + np.asarray(p, np.float32) * self.scale

    def inv(self, p) -> np.ndarray:
        return (np.asarray(p, np.float32) - self.origo) / self.scale


class GeotiffExporter:
    """Builds the geotiff-style image for one map + optional trajectory."""

    RESOLUTION_FACTOR = 3

    def __init__(self, occ_grid: np.ndarray, meta: GridMeta):
        self.grid = np.asarray(occ_grid)
        self.meta = meta
        ext = map_extends(self.grid)
        if ext is None:
            raise ValueError("map has no known cells — nothing to export")
        self.min_coords = np.asarray(ext[0], np.int32)
        self.max_coords = np.asarray(ext[1], np.int32)

        res = F32(meta.resolution)
        rf = F32(self.RESOLUTION_FACTOR)
        ppm = F32(1.0) / res                       # pixels per map meter
        self.ppgm = ppm * rf                       # pixels per geotiff meter
        size_map_f = (self.max_coords - self.min_coords).astype(np.float32)

        rb_margin_m = np.asarray([1.0, 1.0], np.float32)
        lt_margin_m = np.asarray([3.0, 3.0], np.float32)
        total_m = np.ceil(rb_margin_m + size_map_f * res + lt_margin_m)
        self.size_pixels = (total_m * self.ppgm).astype(np.int32)

        self.map_orig_geo = rb_margin_m * self.ppgm           # float pixels
        self.map_end_geo = self.map_orig_geo + size_map_f * rf

        # world<->map from metadata; map<->geo from the extent box; then
        # world<->geo fitted through two probe points (setupTransforms
        # :176-184)
        self.world_map = LinTransform2D(
            np.asarray(meta.origin, np.float32),
            np.asarray([meta.resolution, meta.resolution], np.float32))
        self.map_geo = LinTransform2D.fit(
            self.map_orig_geo, self.map_end_geo,
            self.min_coords.astype(np.float32),
            self.max_coords.astype(np.float32))
        p1_w = np.zeros(2, np.float32)
        p2_w = np.asarray([100.0, 100.0], np.float32)
        p1_g = self.map_geo.inv(self.world_map.inv(p1_w))
        p2_g = self.map_geo.inv(self.world_map.inv(p2_w))
        self.world_geo = LinTransform2D.fit(p1_g, p2_g, p1_w, p2_w)

        # image: Qt size (width=yMax, height=xMax) after the -90 rotation
        x_max, y_max = int(self.size_pixels[0]), int(self.size_pixels[1])
        self.x_max, self.y_max = x_max, y_max
        self.image = np.empty((x_max, y_max, 3), np.uint8)
        self.image[:] = GREY
        self._draw_checkerboard()

    # geo (x, y) -> image (row, col); see transformPainterToImgCoords
    def _geo_to_img(self, gx: float, gy: float) -> Tuple[float, float]:
        return self.x_max - gx, self.y_max - gy

    def _fill_geo_rect(self, gx0, gy0, w, h, color) -> None:
        """Axis-aligned rect in geo coords -> image pixels."""
        r1, c1 = self._geo_to_img(gx0 + w, gy0 + h)
        r2, c2 = self._geo_to_img(gx0, gy0)
        r1 = max(int(np.round(r1)), 0)
        c1 = max(int(np.round(c1)), 0)
        r2 = min(int(np.round(r2)), self.x_max)
        c2 = min(int(np.round(c2)), self.y_max)
        if r2 > r1 and c2 > c1:
            self.image[r1:r2, c1:c2] = color

    def _draw_checkerboard(self) -> None:
        m = F32(self.ppgm)
        for ty in range(int(np.ceil(self.y_max / m))):
            for tx in range(int(np.ceil(self.x_max / m))):
                color = CHECKER_A if (tx + ty) % 2 == 0 else CHECKER_B
                self._fill_geo_rect(tx * m, ty * m, m, m, color)

    def draw_map(self, draw_explored_grid: bool = True) -> None:
        rf = self.RESOLUTION_FACTOR
        sub = self.grid[self.min_coords[1]:self.max_coords[1],
                        self.min_coords[0]:self.max_coords[0]]
        grid_px = self.ppgm * F32(0.5)   # explored grid every 0.5 m
        oy, ox = float(self.map_orig_geo[1]), float(self.map_orig_geo[0])
        for yy in range(sub.shape[0]):
            for xx in range(sub.shape[1]):
                v = sub[yy, xx]
                if v == 0:
                    self._fill_geo_rect(ox + xx * rf, oy + yy * rf, rf, rf,
                                        FREE)
                elif v == 100:
                    self._fill_geo_rect(ox + xx * rf, oy + yy * rf, rf, rf,
                                        OCCUPIED)
        if draw_explored_grid:
            # grid lines across explored (free) cells every 0.5 m
            free = sub == 0
            for gy in np.arange(0.0, sub.shape[0] * rf, grid_px):
                row_cells = free[int(gy // rf)] if int(gy // rf) < \
                    sub.shape[0] else None
                if row_cells is None:
                    continue
                for xx in range(sub.shape[1]):
                    if row_cells[xx]:
                        self._fill_geo_rect(ox + xx * rf, oy + gy, rf, 1.0,
                                            EXPLORED_GRID)
            for gx in np.arange(0.0, sub.shape[1] * rf, grid_px):
                col_cells = free[:, int(gx // rf)] if int(gx // rf) < \
                    sub.shape[1] else None
                if col_cells is None:
                    continue
                for yy in range(sub.shape[0]):
                    if col_cells[yy]:
                        self._fill_geo_rect(ox + gx, oy + yy * rf, 1.0, rf,
                                            EXPLORED_GRID)

    def draw_path(self, path_world: np.ndarray,
                  color=PATH_COLOR, width: int = 3) -> None:
        """Polyline through world-frame points (drawPath :481-522)."""
        pts = np.asarray(path_world, np.float32)
        if len(pts) == 0:
            return
        geo = np.stack([self.world_geo.inv(p[:2]) for p in pts])
        img_pts = [self._geo_to_img(g[0], g[1]) for g in geo]
        for a, b in zip(img_pts[:-1], img_pts[1:]):
            self._draw_line(a, b, color, width)

    def _draw_line(self, a, b, color, width) -> None:
        (r0, c0), (r1, c1) = a, b
        n = int(max(abs(r1 - r0), abs(c1 - c0))) + 1
        rs = np.linspace(r0, r1, n)
        cs = np.linspace(c0, c1, n)
        half = width // 2
        for dr in range(-half, half + 1):
            for dc in range(-half, half + 1):
                rr = np.clip(np.round(rs + dr).astype(int), 0,
                             self.x_max - 1)
                cc = np.clip(np.round(cs + dc).astype(int), 0,
                             self.y_max - 1)
                self.image[rr, cc] = color

    def tfw_lines(self) -> Tuple[str, ...]:
        """World-file content, reference float math
        (writeGeotiffImage :578-608)."""
        res_geo = F32(self.meta.resolution) / F32(self.RESOLUTION_FACTOR)
        corner = self.world_geo.fwd(
            (self.size_pixels + 1).astype(np.float32))
        return (
            f"{res_geo:.10f}",
            f"{0.0:.10f}",
            f"{0.0:.10f}",
            f"-{res_geo:.10f}",
            f"{-corner[1]:.10f}",   # note the axis swap: image is rotated
            f"{corner[0]:.10f}",
        )

    def write(self, base_path: str) -> Tuple[str, str]:
        """Writes <base>.png + <base>.tfw; returns the two paths."""
        png = base_path + ".png"
        tfw = base_path + ".tfw"
        write_png(png, self.image)
        with open(tfw, "w") as f:
            f.write("\n".join(self.tfw_lines()) + "\n")
        return png, tfw


def write_geotiff(occ_grid, meta: GridMeta, base_path: str,
                  path_world: Optional[np.ndarray] = None,
                  draw_explored_grid: bool = True) -> Tuple[str, str]:
    """One-call export: map (+ optional trajectory) -> .png + .tfw."""
    exp = GeotiffExporter(occ_grid, meta)
    exp.draw_map(draw_explored_grid)
    if path_world is not None and len(path_world):
        exp.draw_path(path_world)
    return exp.write(base_path)
