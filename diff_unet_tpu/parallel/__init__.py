from diff_unet_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
)
