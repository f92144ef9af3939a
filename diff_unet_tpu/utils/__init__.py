from diff_unet_tpu.utils.config import Config, load_config, parse_args  # noqa: F401
from diff_unet_tpu.utils.logging import MetricLogger, format_table  # noqa: F401
