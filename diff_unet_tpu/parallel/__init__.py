from diff_unet_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
)
from diff_unet_tpu.parallel.distributed import (  # noqa: F401
    auto_initialize,
    create_pod_mesh,
    gather_eval_rows,
    global_batch_from_local,
    local_batch_indices,
    replicate_across_processes,
    sequential_eval_shard,
)
