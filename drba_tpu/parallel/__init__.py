from drba_tpu.parallel.mesh import make_mesh, shard_batch, window_sharding

__all__ = ["make_mesh", "shard_batch", "window_sharding"]
