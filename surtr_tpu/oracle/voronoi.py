"""f64 all-pairs Voronoi oracle (replaces voro++ as the reference point)."""

from __future__ import annotations

import numpy as np

from surtr_tpu.oracle.poly import clip_polyhedron, cube_polyhedron


def voronoi_cells_oracle(seeds: np.ndarray, half: float = 0.5):
    """Exact bounded Voronoi cells: unit-cube polyhedron clipped by the
    bisectors of *all* other seeds (no pruning). Returns list[Polyhedron]."""
    seeds = np.asarray(seeds, np.float64)
    n = len(seeds)
    cells = []
    for i in range(n):
        planes = []
        order = np.argsort(np.sum((seeds - seeds[i]) ** 2, axis=1))
        for j in order:
            if j == i:
                continue
            diff = seeds[j] - seeds[i]
            dist = np.linalg.norm(diff)
            if dist < 1e-12:
                continue
            nrm = diff / dist
            mid = (seeds[i] + seeds[j]) * 0.5
            planes.append(np.append(nrm, -nrm @ mid))
        cells.append(clip_polyhedron(cube_polyhedron(half), planes))
    return cells
