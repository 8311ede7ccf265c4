"""f64 adjacency-polyhedron kernel (oracle).

Implements the reference's vertex-adjacency representation and its clipping
semantics (Poly::Polyhedron / ClipPolyhedron — itself a port of Spheral-style
r3d clipping; /root/reference/Src/Poly.cpp:265-554): each vertex stores a
CCW-ordered neighbor ring; clipping inserts edge/plane intersection vertices,
patches rings by walking face loops, collapses degree-2 vertices and compacts.

Pure Python/NumPy, float64, tolerance 1e-10 (the reference's
ComparePlanePoint epsilon, Poly.cpp:718). Not performance-relevant — it is
the test oracle.
"""

from __future__ import annotations

import dataclasses

import numpy as np

TOL = 1e-10


@dataclasses.dataclass
class Vertex:
    pos: np.ndarray
    neigh: list  # CCW-ordered neighbor indices
    comp: int = 1


Polyhedron = list  # list[Vertex]


def _face_loop_next(poly: Polyhedron, v: int, vprev: int) -> int:
    """FaceLoop: the neighbor *before* vprev in v's ring (Poly.cpp:34-41)."""
    ring = poly[v].neigh
    k = ring.index(vprev)
    return ring[k - 1]


def extract_faces(poly: Polyhedron):
    """Walk face loops (Poly::ExtractFaces, Poly.cpp:89-126)."""
    faces = []
    visited = set()
    for i, v in enumerate(poly):
        if v.comp < 0:
            continue
        for adj in v.neigh:
            if (i, adj) in visited:
                continue
            face = [i]
            istart, iprev, inext = i, i, adj
            while inext != istart:
                visited.add((iprev, inext))
                face.append(inext)
                iprev, inext = inext, _face_loop_next(poly, inext, iprev)
            visited.add((iprev, inext))
            faces.append(face)
    return faces


def moments(poly: Polyhedron):
    """Volume + centroid via the divergence theorem (Poly.cpp:55-87)."""
    if len(poly) <= 3:
        return 0.0, np.zeros(3)
    origin = poly[0].pos
    vol = 0.0
    first = np.zeros(3)
    for face in extract_faces(poly):
        p0 = poly[face[0]].pos - origin
        for k in range(1, len(face) - 1):
            p1 = poly[face[k]].pos - origin
            p2 = poly[face[(k + 1) % len(face)]].pos - origin
            dV = p0 @ np.cross(p1, p2)
            vol += dV
            first += (p0 + p1 + p2) * dV
    vol /= 6.0
    if abs(vol) > 1e-30:
        first = first / (24.0 * vol) + origin
    else:
        first = origin.copy()
    return vol, first


def cube_polyhedron(half: float = 0.5) -> Polyhedron:
    """Unit cube (Poly::GetBB semantics) with consistent CCW rings."""
    corners = np.array(
        [[x, y, z] for x in (-half, half) for y in (-half, half) for z in (-half, half)],
        np.float64,
    )
    quads = [
        (4, 6, 7, 5), (0, 1, 3, 2), (2, 3, 7, 6),
        (0, 4, 5, 1), (1, 5, 7, 3), (0, 2, 6, 4),
    ]
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    return polyhedron_from_mesh(corners, np.asarray(tris))


def polyhedron_from_mesh(verts: np.ndarray, tris: np.ndarray) -> Polyhedron:
    """Adjacency rings from a triangle mesh (ExtractNeighborFromMesh,
    Poly.cpp:128-263). Requires a closed orientable mesh."""
    n = len(verts)
    succ = [dict() for _ in range(n)]
    for a, b, c in tris:
        # At each corner, record the walk around the vertex: in triangle
        # (v, p, q) (CCW outward), q follows p in v's ring.
        succ[a][b] = c
        succ[b][c] = a
        succ[c][a] = b
    poly = []
    for v in range(n):
        ring = []
        if succ[v]:
            start = next(iter(succ[v]))
            cur = start
            for _ in range(len(succ[v])):
                ring.append(cur)
                cur = succ[v][cur]
                if cur == start:
                    break
        poly.append(Vertex(np.asarray(verts[v], np.float64), ring))
    # Orientation check: flip rings if volume is negative.
    vol, _ = moments(poly)
    if vol < 0:
        for v in poly:
            v.neigh = v.neigh[::-1]
    return poly


def _compare(plane_n, plane_d, p):
    s = plane_d + plane_n @ p
    if abs(s) < TOL:
        return 0
    return 1 if s < 0 else -1  # +1 = inside/kept (Poly.cpp:716-723)


def _intersect(a, b, plane_n, plane_d):
    sa = plane_d + plane_n @ a
    sb = plane_d + plane_n @ b
    return (a * sb - b * sa) / (sb - sa)


def clip_polyhedron(poly: Polyhedron, planes) -> Polyhedron:
    """Clip by a plane list, keeping n·x + d < 0 (ClipPolyhedron,
    Poly.cpp:265-554)."""
    poly = [Vertex(v.pos.copy(), list(v.neigh), v.comp) for v in poly]
    for plane in planes:
        if not poly:
            break
        n, d = np.asarray(plane[:3], np.float64), float(plane[3])
        comps = [_compare(n, d, v.pos) for v in poly]
        for v, c in zip(poly, comps):
            v.comp = c
        below = not any(c == 1 for c in comps)   # nothing strictly kept
        above = not any(c == -1 for c in comps)  # nothing strictly clipped
        if below:        # entirely removed (Poly.cpp:322-327)
            poly = []
            break
        if above:        # entirely kept
            continue

        # 1. Insert intersection vertices on straddling edges.
        nverts0 = len(poly)
        for i in range(nverts0):
            if poly[i].comp != -1:
                continue
            for slot, jn in enumerate(poly[i].neigh):
                if poly[jn].comp > 0:
                    inew = len(poly)
                    poly.append(
                        Vertex(
                            _intersect(poly[i].pos, poly[jn].pos, n, d),
                            [i, jn],
                            2,
                        )
                    )
                    poly[jn].neigh[poly[jn].neigh.index(i)] = inew
                    poly[i].neigh[slot] = inew
        nverts = len(poly)

        # 2. Patch topology links through clipped regions.
        old_neighbors = [list(v.neigh) for v in poly]
        for ii in range(nverts):
            i = (ii + nverts0) % nverts
            if poly[i].comp not in (0, 2):
                continue
            for j in range(len(poly[i].neigh)):
                jn = poly[i].neigh[j]
                if jn < 0 or poly[jn].comp != -1:
                    continue
                # Walk the face loop to the first surviving vertex.
                iprev, inext = i, jn
                k = 0
                while poly[inext].comp == -1 and k < nverts:
                    iprev, inext = inext, _face_loop_next(poly, inext, iprev)
                    k += 1
                ring = poly[i].neigh
                if ring[(j + 1) % len(ring)] == inext or inext == i:
                    poly[i].neigh[j] = -1  # mark for removal
                else:
                    poly[i].neigh[j] = inext
                    if poly[inext].comp == 2:
                        poly[inext].neigh.insert(0, i)
                        old_neighbors[inext].insert(0, -1)
                    else:
                        off = old_neighbors[inext].index(iprev)
                        poly[inext].neigh.insert(off, i)
                        old_neighbors[inext].insert(off, i)
        for v in poly:
            v.neigh = [x for x in v.neigh if x != -1]

        # 3. Collapse degree-2 (colinear) vertices.
        updated = True
        while updated:
            updated = False
            for i, v in enumerate(poly):
                if v.comp >= 0 and len(v.neigh) == 2:
                    updated = True
                    ip, inx = v.neigh
                    poly[ip].neigh[poly[ip].neigh.index(i)] = inx
                    poly[inx].neigh[poly[inx].neigh.index(i)] = ip
                    v.comp = -1

        # 4. Compact.
        remap = {}
        out = []
        for i, v in enumerate(poly):
            if v.comp >= 0:
                remap[i] = len(out)
                out.append(v)
        for v in out:
            v.neigh = [remap[x] for x in v.neigh]
        poly = out if len(out) >= 4 else []
    return poly
