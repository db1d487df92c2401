"""Multi-chip parallelism: device meshes and sharding helpers."""

from fgt_tpu.parallel.mesh import make_mesh, shard_batch, replicate
