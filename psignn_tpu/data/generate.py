"""Dataset factory: n_mesh meshes × n_samples RHS samples → .npy archives.

Byte-compatible with the reference's format
(``dirichlet/dataset/generate_data.py:25-98``): seven pickled object arrays
(A_sparse_matrix, b_matrix, sol, prb_data, tags, coordinates, distance) plus
``add_dss_variable`` deriving (A_prime, b_prime) for the DSS family
(generate_data.py:100-143) and a ``dataset_info.csv`` stats file.

CLI: ``python -m psignn_tpu.data.generate --path_data data/ --n_mesh 200
--n_samples 50`` (reference defaults, generate_data.py:150-151).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np
import scipy.sparse as sp

from .fem import solve_poisson
from .meshgen import blob_mesh


def generate_data(path_data: str, n_mesh: int = 200, n_samples: int = 50,
                  radius: float = 1.0, hsize: float = 0.08,
                  nb_bound_points: int = 10, seed: int = 1234,
                  variant: str = "dirichlet",
                  verbose: bool = True) -> Dict[str, list]:
    from .fem import solve_poisson_mixed
    from .meshgen import mixed_blob_mesh

    rng = np.random.default_rng(seed)
    keys = ["A_sparse_matrix", "b_matrix", "sol", "prb_data",
            "tags", "coordinates", "distance"]
    if variant == "mixed":
        keys.append("unit_normal_vector")
    lists = {k: [] for k in keys}

    for n in range(n_mesh):
        if variant == "mixed":
            mesh = mixed_blob_mesh(radius=radius, hsize=hsize,
                                   nb_bound_points=nb_bound_points, rng=rng)
        else:
            mesh = blob_mesh(radius=radius, hsize=hsize,
                             nb_bound_points=nb_bound_points, rng=rng)
        for _ in range(n_samples):
            if variant == "mixed":
                s = solve_poisson_mixed(mesh, radius, rng)
                lists["unit_normal_vector"].append(s["unit_normal_vector"])
            else:
                s = solve_poisson(mesh, radius, rng)
            lists["A_sparse_matrix"].append(s["A"])
            lists["b_matrix"].append(s["b"])
            lists["sol"].append(s["sol"])
            lists["prb_data"].append(s["prb_data"])
            lists["tags"].append(s["tags"])
            lists["coordinates"].append(s["coordinates"])
            lists["distance"].append(s["distance"])
        if verbose and (n + 1) % 10 == 0:
            print(f"mesh {n + 1}/{n_mesh} ({mesh.n_points} nodes)")

    os.makedirs(path_data, exist_ok=True)
    for k, v in lists.items():
        arr = np.empty(len(v), dtype=object)
        for i, item in enumerate(v):
            arr[i] = item
        np.save(os.path.join(path_data, f"{k}.npy"), arr, allow_pickle=True)

    _write_info(path_data, lists, n_mesh, n_samples)
    return lists


def _write_info(path_data, lists, n_mesh, n_samples):
    seq_nodes = [len(c) for c in lists["coordinates"]]
    prb = np.vstack(lists["prb_data"])
    dist = np.vstack(lists["distance"])
    with open(os.path.join(path_data, "dataset_info.csv"), "w") as f:
        f.write("Number of different meshes : %d\n" % n_mesh)
        f.write("Number of samples per meshes : %d\n" % n_samples)
        f.write("Total number of instances : %d\n" % (n_mesh * n_samples))
        f.write("Mean of prb_data : %s\n" % list(np.around(prb.mean(0), 4)))
        f.write("Std of prb_data : %s\n" % list(np.around(prb.std(0), 4)))
        f.write("Mean of distance : %s\n" % list(np.around(dist.mean(0), 4)))
        f.write("Std of distance : %s\n" % list(np.around(dist.std(0), 4)))
        f.write("Mean number of nodes : %d\n" % int(np.mean(seq_nodes)))
        f.write("Std number of nodes : %d\n" % int(np.std(seq_nodes)))
        f.write("Min number of nodes : %d\n" % int(np.min(seq_nodes)))
        f.write("Max number of nodes : %d\n" % int(np.max(seq_nodes)))


def add_dss_variable(path_data: str) -> None:
    """Derive the DSS-encoded system (generate_data.py:100-143):
    boundary rows detected via ``A == 1`` diagonal, A' = A with zeroed
    diagonal, b' = [b·(1−is_bnd), is_bnd, b·is_bnd]."""
    list_A = np.load(os.path.join(path_data, "A_sparse_matrix.npy"),
                     allow_pickle=True)
    list_b = np.load(os.path.join(path_data, "b_matrix.npy"),
                     allow_pickle=True)

    b_prime, A_prime, coeff = [], [], []
    for A_i, b_i in zip(list_A, list_b):
        A_d = A_i.toarray()
        b_i = np.copy(b_i)
        row, _ = np.where(A_d == 1)
        np.fill_diagonal(A_d, 0.0)
        C = np.c_[b_i, np.zeros(len(b_i)), np.zeros(len(b_i))]
        C[row, 2] = C[row, 0]
        C[row, 1] = 1.0
        C[row, 0] = 0.0
        sA = sp.csr_matrix(A_d)
        A_prime.append(sA)
        coeff.append(sA.data)
        b_prime.append(C)

    for name, v in [("b_prime", b_prime), ("A_prime", A_prime)]:
        arr = np.empty(len(v), dtype=object)
        for i, item in enumerate(v):
            arr[i] = item
        np.save(os.path.join(path_data, f"{name}.npy"), arr, allow_pickle=True)

    with open(os.path.join(path_data, "dataset_info.csv"), "a") as f:
        a = np.hstack(coeff)
        bp = np.vstack(b_prime)
        f.write("Mean of a_ij : %s\n" % np.around(a.mean(), 4))
        f.write("Std of a_ij : %s\n" % np.around(a.std(), 4))
        f.write("Mean of b_prime : %s\n" % list(np.around(bp.mean(0), 4)))
        f.write("Std of b_prime : %s\n" % list(np.around(bp.std(0), 4)))


def main(argv=None):
    p = argparse.ArgumentParser(description="psignn_tpu dataset factory")
    p.add_argument("--path_data", type=str, default="data/")
    p.add_argument("--n_mesh", type=int, default=200)
    p.add_argument("--n_samples", type=int, default=50)
    p.add_argument("--radius", type=float, default=1.0)
    p.add_argument("--hsize", type=float, default=0.08)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--variant", type=str, default="dirichlet",
                   choices=["dirichlet", "mixed"])
    args = p.parse_args(argv)
    generate_data(args.path_data, args.n_mesh, args.n_samples,
                  args.radius, args.hsize, seed=args.seed,
                  variant=args.variant)
    if args.variant == "dirichlet":
        add_dss_variable(args.path_data)


if __name__ == "__main__":
    main()
