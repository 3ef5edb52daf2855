from .wrappers import Camera, Pose

__all__ = ["Camera", "Pose"]
