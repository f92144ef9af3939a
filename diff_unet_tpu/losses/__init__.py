from diff_unet_tpu.losses.losses import (  # noqa: F401
    CompositeLoss,
    bce_loss,
    boundary_loss,
    ce_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
    generalized_wasserstein_dice_loss,
    hausdorff_er_loss,
    mse_loss,
    multi_neighbor_loss,
)
from diff_unet_tpu.losses.edt import one_hot_to_dist, signed_distance_maps  # noqa: F401
