from diff_unet_tpu.models.basic_unet import (  # noqa: F401
    BasicUNetDenoiser,
    BasicUNetEncoder,
)
from diff_unet_tpu.models.diff_unet import DiffUNet  # noqa: F401
from diff_unet_tpu.models.hybrid_mim import (  # noqa: F401
    HybridMIMBasicUNet,
)
