"""Offline data factory and dataset readers.

Replaces the reference's gmsh + FEniCS/DOLFIN native pipeline
(``dirichlet/dataset/{build_mesh,extract_data,generate_data}.py``) with a
self-contained numpy/scipy implementation: random blob meshes via periodic
splines + Delaunay, our own P1 FEM assembly, sparse direct solve as oracle,
and the same 7/8-file ``.npy`` object-array dataset format so reference
datasets remain readable.
"""

from .meshgen import blob_mesh, Mesh
from .fem import solve_poisson, assemble_p1
from .reader import load_dataset, GraphSample, split_dataset
