from .mesh import make_mesh, shard_world, make_distributed_train_fn  # noqa: F401
