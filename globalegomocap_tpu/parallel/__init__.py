"""Device-mesh and sharding utilities."""

from globalegomocap_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, window_sharding)
