"""Random blob-domain triangular mesh generation (no gmsh).

The reference (``dirichlet/dataset/build_mesh.py:20-130``) places
``nb_bound_points`` boundary points at randomly perturbed radius
``t ∈ [0.75, 1]·R`` on a circle, fits a spline through them, and lets gmsh
triangulate at mesh size ``hsize``.  This module reproduces the same domain
family with scipy only:

1. perturb points on the circle exactly as the reference does,
2. fit a periodic cubic spline through them,
3. sample the boundary curve at ~``hsize`` arc-length spacing,
4. fill the interior with a jittered hexagonal lattice at ``hsize`` pitch,
   dropping points too close to the boundary,
5. Laplacian-smooth the interior vertices (gmsh smooths by default —
   without this our FEM stiffness weights had ~1.9x the reference's
   spread: a_ij std 0.172 vs 0.0924, enough to put the trained nets'
   normalized inputs out of distribution),
6. Delaunay-triangulate and keep triangles whose centroid lies inside.

Calibration against the reference's published mesh statistics
(mean nodes 192/487/1825 at r=0.6/1/2, tests/txtresults/psignn_results.csv;
a_ij mean −0.5838 std 0.0924, dss reader constants): boundary exclusion
0.35·hsize + 4 smoothing passes lands within ~2 % on node counts and
brings a_ij std to ≈0.11.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
from matplotlib.path import Path as MplPath
from scipy.interpolate import CubicSpline
from scipy.spatial import Delaunay


@dataclasses.dataclass
class Mesh:
    points: np.ndarray        # (N, 2) float64 vertex coordinates
    triangles: np.ndarray     # (T, 3) int32 vertex indices
    boundary_mask: np.ndarray  # (N,) bool, True for boundary vertices
    # segment tag per boundary vertex (Dirichlet=101 by default; mixed-BC
    # meshes use 101/303 for Dirichlet/Neumann,
    # mixed/dataset/build_mesh.py:170-171)
    boundary_tag: np.ndarray   # (N,) int32, 0 for interior
    # ordered boundary vertex loop (CCW); consecutive pairs are the boundary
    # facets — used for outward vertex normals in the mixed variant
    boundary_loop: Optional[np.ndarray] = None  # (n_bnd,) int32

    @property
    def n_points(self) -> int:
        return int(self.points.shape[0])


def _boundary_spline(radius: float, nb_bound_points: int, rng: np.random.Generator):
    """Periodic cubic spline through perturbed circle points
    (build_mesh.py:57-69: t = 0.25*rand + 0.75 scaling both coords)."""
    alpha = np.linspace(0.0, 2.0 * np.pi, nb_bound_points)
    xs, ys = [], []
    for i in range(nb_bound_points - 1):
        t = (1.0 - 0.75) * rng.random() + 0.75
        xs.append(t * radius * np.cos(alpha[i]))
        ys.append(t * radius * np.sin(alpha[i]))
    xs.append(xs[0])
    ys.append(ys[0])
    pts = np.stack([xs, ys], axis=1)
    s = np.arange(len(pts), dtype=np.float64)
    return CubicSpline(s, pts, bc_type="periodic")


def _sample_boundary(spline, n_ctrl: int, hsize: float,
                     return_params: bool = False):
    """Sample the closed curve at ≈hsize arc-length spacing."""
    dense_t = np.linspace(0.0, n_ctrl - 1, 4096, endpoint=False)
    dense = spline(dense_t)
    seg = np.linalg.norm(np.diff(dense, axis=0, append=dense[:1]), axis=1)
    arclen = np.concatenate([[0.0], np.cumsum(seg)])[:-1]
    total = arclen[-1] + seg[-1]
    n_bnd = max(8, int(round(total / hsize)))
    targets = np.linspace(0.0, total, n_bnd, endpoint=False)
    idx = np.searchsorted(arclen, targets)
    idx = np.clip(idx, 0, len(dense) - 1)
    if return_params:
        return dense[idx], dense_t[idx]
    return dense[idx]


def _interior_points(boundary: np.ndarray, hsize: float,
                     rng: np.random.Generator) -> np.ndarray:
    """Jittered hex lattice clipped to the polygon, away from the boundary."""
    path = MplPath(boundary)
    lo = boundary.min(axis=0) - hsize
    hi = boundary.max(axis=0) + hsize
    dx = hsize
    dy = hsize * np.sqrt(3.0) / 2.0
    ys = np.arange(lo[1], hi[1], dy)
    pts = []
    for row, y in enumerate(ys):
        xs = np.arange(lo[0] + (0.5 * dx if row % 2 else 0.0), hi[0], dx)
        for x in xs:
            pts.append((x, y))
    pts = np.asarray(pts)
    if len(pts) == 0:
        return np.zeros((0, 2))
    pts = pts + rng.uniform(-0.12, 0.12, pts.shape) * hsize
    inside = path.contains_points(pts)
    pts = pts[inside]
    # drop points within 0.35*hsize of the boundary polyline (calibrated
    # against the reference's node counts — module docstring)
    if len(pts):
        d2 = np.min(
            np.sum((pts[:, None, :] - boundary[None, :, :]) ** 2, axis=-1), axis=1)
        pts = pts[d2 > (0.35 * hsize) ** 2]
    return pts


def _laplacian_smooth(boundary: np.ndarray, interior: np.ndarray,
                      passes: int = 4) -> np.ndarray:
    """Move each interior vertex to the mean of its Delaunay neighbors
    (boundary fixed), re-triangulating between passes — the element-quality
    equalizer gmsh applies by default (module docstring calibration)."""
    if len(interior) == 0 or passes == 0:
        return interior
    n_b = len(boundary)
    path = MplPath(boundary)
    for _ in range(passes):
        points = np.concatenate([boundary, interior])
        tri = Delaunay(points)
        cent = points[tri.simplices].mean(axis=1)
        tris = tri.simplices[path.contains_points(cent)]
        e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
        e = np.concatenate([e, e[:, ::-1]])
        acc = np.zeros_like(points)
        cnt = np.zeros(len(points))
        np.add.at(acc, e[:, 0], points[e[:, 1]])
        np.add.at(cnt, e[:, 0], 1)
        new = np.where(cnt[:, None] > 0,
                       acc / np.maximum(cnt, 1)[:, None], points)
        interior = new[n_b:]
    return interior


def _finalize_mesh(points: np.ndarray, triangles: np.ndarray,
                   n_bnd: int, bnd_tags: np.ndarray) -> Mesh:
    """Drop unused vertices, build boundary mask/tags/loop."""
    used = np.zeros(len(points), bool)
    used[triangles.ravel()] = True
    remap = -np.ones(len(points), np.int64)
    remap[used] = np.arange(used.sum())
    new_points = points[used]
    new_triangles = remap[triangles].astype(np.int32)

    orig_b = np.arange(n_bnd)[used[:n_bnd]]
    loop = remap[orig_b].astype(np.int32)     # keeps CCW boundary order
    bmask = np.zeros(len(new_points), bool)
    bmask[loop] = True
    btag = np.zeros(len(new_points), np.int32)
    btag[loop] = bnd_tags[orig_b]
    return Mesh(points=new_points, triangles=new_triangles,
                boundary_mask=bmask, boundary_tag=btag, boundary_loop=loop)


def blob_mesh(radius: float = 1.0, hsize: float = 0.08,
              nb_bound_points: int = 10, seed: Optional[int] = None,
              rng: Optional[np.random.Generator] = None,
              tag_dirichlet: int = 101) -> Mesh:
    """Generate one random blob mesh (reference defaults: R=1, hsize=0.08,
    10 boundary points, generate_data.py:37-47)."""
    if rng is None:
        rng = np.random.default_rng(seed)
    spline = _boundary_spline(radius, nb_bound_points, rng)
    boundary = _sample_boundary(spline, nb_bound_points, hsize)
    interior = _interior_points(boundary, hsize, rng)
    interior = _laplacian_smooth(boundary, interior)
    points = np.concatenate([boundary, interior], axis=0)
    tri = Delaunay(points)
    cent = points[tri.simplices].mean(axis=1)
    keep = MplPath(boundary).contains_points(cent)
    triangles = tri.simplices[keep].astype(np.int32)
    bnd_tags = np.full(len(boundary), tag_dirichlet, np.int32)
    return _finalize_mesh(points, triangles, len(boundary), bnd_tags)


def mixed_blob_mesh(radius: float = 1.0, hsize: float = 0.08,
                    nb_bound_points: int = 10, seed: Optional[int] = None,
                    rng: Optional[np.random.Generator] = None,
                    tag_dirichlet: int = 101, tag_neumann: int = 303) -> Mesh:
    """Mixed-BC blob mesh: the boundary splits into 4 arcs by control-point
    quarters with randomly-oriented alternating Dirichlet/Neumann pairs
    (mixed/dataset/build_mesh.py:78-107).  A vertex is Dirichlet if it
    touches any Dirichlet facet (gmsh physical-group + DirichletBC facet
    semantics), so interface vertices go to Dirichlet."""
    if rng is None:
        rng = np.random.default_rng(seed)
    spline = _boundary_spline(radius, nb_bound_points, rng)
    boundary, params = _sample_boundary(spline, nb_bound_points, hsize,
                                        return_params=True)
    n = len(boundary)
    # facet between samples i and i+1; quarter by midpoint parameter
    t_max = float(nb_bound_points - 1)
    p0 = params
    p1 = np.roll(params, -1)
    p1 = np.where(p1 < p0, p1 + t_max, p1)
    mid = ((p0 + p1) / 2.0) % t_max
    quarter = np.minimum(mid / t_max * 4.0, 3.999).astype(int)
    sense = int(rng.integers(0, 2))
    dirichlet_arcs = {0, 2} if sense == 1 else {1, 3}
    facet_is_d = np.isin(quarter, list(dirichlet_arcs))
    # vertex i touches facets i-1 and i
    vert_is_d = facet_is_d | np.roll(facet_is_d, 1)
    bnd_tags = np.where(vert_is_d, tag_dirichlet, tag_neumann).astype(np.int32)

    interior = _interior_points(boundary, hsize, rng)
    interior = _laplacian_smooth(boundary, interior)
    points = np.concatenate([boundary, interior], axis=0)
    tri = Delaunay(points)
    cent = points[tri.simplices].mean(axis=1)
    keep = MplPath(boundary).contains_points(cent)
    triangles = tri.simplices[keep].astype(np.int32)
    return _finalize_mesh(points, triangles, n, bnd_tags)


def circle_mesh(radius: float = 1.0, hsize: float = 0.08,
                seed: Optional[int] = None) -> Mesh:
    """Plain circle domain (used by the growing-geometry benchmark,
    tests/special_geo — circle generator)."""
    rng = np.random.default_rng(seed)
    n_bnd = max(8, int(round(2 * np.pi * radius / hsize)))
    theta = np.linspace(0, 2 * np.pi, n_bnd, endpoint=False)
    boundary = radius * np.stack([np.cos(theta), np.sin(theta)], axis=1)
    interior = _interior_points(boundary, hsize, rng)
    interior = _laplacian_smooth(boundary, interior)
    points = np.concatenate([boundary, interior], axis=0)
    tri = Delaunay(points)
    cent = points[tri.simplices].mean(axis=1)
    # centroid-in-circle test with tolerance for boundary-chord triangles
    keep = np.linalg.norm(cent, axis=1) <= radius
    triangles = tri.simplices[keep].astype(np.int32)
    bnd_tags = np.full(n_bnd, 101, np.int32)
    return _finalize_mesh(points, triangles, n_bnd, bnd_tags)


def mesh_from_dolfin_h5(path: str, tag_dirichlet: int = 101) -> Mesh:
    """Load a DOLFIN-HDF5 mesh (the reference's ``build_mesh`` output
    format: ``mesh/coordinates``, ``mesh/topology``, ``facet/topology``,
    ``facet/values``; dirichlet/dataset/build_mesh.py:111-115) into our
    Mesh container.  Lets the framework evaluate on the reference's own
    gmsh-generated meshes — e.g. the checked-in
    ``tests/special_geo/mesh_files/original/mesh.h5`` — isolating
    mesh-generator statistics from model behavior."""
    import h5py

    with h5py.File(path, "r") as f:
        points = np.asarray(f["mesh/coordinates"])[:, :2].astype(np.float64)
        triangles = np.asarray(f["mesh/topology"]).astype(np.int32)
        facets = np.asarray(f["facet/topology"]).astype(np.int64)
        fvals = np.asarray(f["facet/values"]).astype(np.int64)

    n = points.shape[0]
    boundary_mask = np.zeros(n, bool)
    boundary_tag = np.zeros(n, np.int32)
    tagged = facets[fvals == tag_dirichlet]
    boundary_mask[np.unique(tagged)] = True
    boundary_tag[np.unique(tagged)] = tag_dirichlet
    return Mesh(points=points, triangles=triangles,
                boundary_mask=boundary_mask, boundary_tag=boundary_tag,
                boundary_loop=None)
