from diff_unet_tpu.diffusion.schedule import (  # noqa: F401
    Schedule,
    get_named_beta_schedule,
    space_timesteps,
)
from diff_unet_tpu.diffusion import gaussian as gaussian  # noqa: F401
from diff_unet_tpu.diffusion import sampling as sampling  # noqa: F401
