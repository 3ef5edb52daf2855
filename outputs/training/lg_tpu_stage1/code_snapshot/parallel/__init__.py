from .mesh import get_mesh, replicate, shard_batch_spec
from .ring_attention import ring_attention

__all__ = ["get_mesh", "replicate", "shard_batch_spec", "ring_attention"]
