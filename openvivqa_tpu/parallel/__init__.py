from .mesh import get_mesh, shard_batch_spec, replicate_spec  # noqa: F401
