"""Multi-view SfM back-end — distributed bundle adjustment and pose-graph
optimization (NEW relative to the reference, per BASELINE.json: the reference
glue-factory stops at two-view estimation; this layer closes the loop to a
full SLAM/SfM engine on TPU meshes)."""

from .alignment import absolute_trajectory_error, umeyama_alignment
from .ba import BAProblem, bundle_adjust, bundle_adjust_sharded
from .pipeline import run_sfm
from .pose_graph import optimize_pose_graph
from .triangulation import triangulate_linear, triangulate_two_view

__all__ = [
    "BAProblem",
    "absolute_trajectory_error",
    "bundle_adjust",
    "bundle_adjust_sharded",
    "optimize_pose_graph",
    "run_sfm",
    "triangulate_linear",
    "triangulate_two_view",
    "umeyama_alignment",
]
