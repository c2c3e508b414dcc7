from applecider_tpu.ops.losses import (  # noqa: F401
    class_balanced_weights,
    cross_entropy,
    dice_loss,
    focal_loss,
    multiclass_bce_loss,
)
from applecider_tpu.ops.moe import topk_dense_dispatch  # noqa: F401
