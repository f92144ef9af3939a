from diff_unet_tpu.ops.blocks import (  # noqa: F401
    ConvNormAct,
    Down,
    InstanceNorm,
    TimestepEmbedder,
    TwoConv,
    UpCat,
    timestep_embedding,
)
