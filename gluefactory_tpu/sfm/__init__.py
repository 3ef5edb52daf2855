"""Multi-view SfM back-end — distributed bundle adjustment and pose-graph
optimization (NEW relative to the reference, per BASELINE.json: the reference
glue-factory stops at two-view estimation; this layer closes the loop to a
full SLAM/SfM engine on TPU meshes)."""

from .ba import BAProblem, bundle_adjust, bundle_adjust_sharded
from .pose_graph import optimize_pose_graph
from .triangulation import triangulate_linear, triangulate_two_view

__all__ = [
    "BAProblem",
    "bundle_adjust",
    "bundle_adjust_sharded",
    "optimize_pose_graph",
    "triangulate_linear",
    "triangulate_two_view",
]
