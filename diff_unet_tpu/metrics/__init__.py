from diff_unet_tpu.metrics.metrics import (  # noqa: F401
    ConfusionMatrix,
    average_surface_distance,
    average_symmetric_surface_distance,
    dice_coeff,
    dice_per_class,
    hausdorff_distance,
    hausdorff_distance_95,
    iou,
    validation_dice,
)
