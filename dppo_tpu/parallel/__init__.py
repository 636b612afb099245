from dppo_tpu.parallel.mesh import (
    make_mesh,
    shard_leading_axis,
    replicate,
)
