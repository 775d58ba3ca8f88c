"""flax.linen model families.

- :mod:`unet`            — the segmentation generator (encoder / dilated
                           bottleneck / point-cloud head / decoder).
- :mod:`discriminator`   — PatchGAN discriminators for output space (D1) and
                           entropy-map space (D2).
- :mod:`pointnet`        — PointNet binary classifier over point clouds (D4)
                           with STN3d/STNkd transformers.

All modules use the TPU-native NHWC layout and accept a ``compute_dtype``
(bfloat16 on TPU by default in the trainer) with float32 parameters.
"""

from pointcloududa_tpu.models.unet import SegmentationPointModel  # noqa: F401
from pointcloududa_tpu.models.discriminator import UncertaintyDiscriminator  # noqa: F401
from pointcloududa_tpu.models.pointnet import PointNetCls, feature_transform_regularizer  # noqa: F401
