"""pointcloududa_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
point-cloud-assisted unsupervised domain adaptation of cardiac image
segmentation.

Re-designed from scratch for TPU hardware with the capabilities of the
PyTorch reference `sulaimanvesal/PointCloudUDA` (IEEE-TMI 2021,
"Adapt Everywhere: Unsupervised Adaptation of Point-Clouds and Entropy
Minimisation for Multi-modal Cardiac Image Segmentation").

Layout
------
- ``models``    : flax.linen modules — U-Net segmentor (+ point-cloud head),
                  PatchGAN output/entropy discriminators, PointNet classifier.
- ``ops``       : pure-function losses, entropy maps, Chamfer distance
                  (jnp + Pallas), metrics, post-processing, augmentation.
- ``parallel``  : device-mesh construction and sharding rules (DP over ICI).
- ``train``     : train state (3 optimizers), the single jitted 5-phase UDA
                  step, epoch loop, checkpointing.
- ``data``      : host-side pipeline — CSV manifests, dataset adapters,
                  ring-buffer batch sampler, device prefetch.
- ``eval``      : volume-level inference + Dice/HD/ASD scoring.
- ``utils``     : timers, host-native ops (FPS, surface extraction), IO.
- ``cli``       : entry points mirroring the reference's four scripts.
"""

__version__ = "0.1.0"
