"""Pure-function compute ops: losses, entropy maps, Chamfer distance,
metrics, post-processing, and data augmentation.

Everything here is jit-compatible unless the docstring says "host-side".
"""

from pointcloududa_tpu.ops.losses import (  # noqa: F401
    bce_from_probs,
    bce_with_logits,
    cross_entropy,
    jaccard_loss,
    weighted_self_information,
    chamfer_loss,
    batch_pairwise_dist,
)
