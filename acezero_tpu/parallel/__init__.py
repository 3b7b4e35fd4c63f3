from acezero_tpu.parallel.mesh import make_mesh, shard_rows, replicate

__all__ = ["make_mesh", "shard_rows", "replicate"]
