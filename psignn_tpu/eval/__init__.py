"""Evaluation: per-graph metric tables, growing-geometry sweep, geometry zoo."""

from .metrics import errors_batch, evaluate_dataset, metrics_table
from .geometries import GEOMETRY_BUILDERS, build_geometry
