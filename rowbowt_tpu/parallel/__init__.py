from rowbowt_tpu.parallel.mesh import make_mesh, shard_queries, replicate_index

__all__ = ["make_mesh", "shard_queries", "replicate_index"]
