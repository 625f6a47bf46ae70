"""endoscopy_tpu — TPU-native semi-supervised endoscopy image classification.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
taindp98/Endoscopy-Image-Classification (PyTorch + timm), designed TPU-first:

- All augmentation (weak/strong RandAugment views, color jitter, cutout) runs
  **on device** inside the jitted train step, fed by uint8 canonical batches.
- Training steps are pure jitted functions over a ``jax.sharding.Mesh``
  (data-parallel batch sharding + tensor-parallel head sharding); gradients
  and batch-norm statistics are globally correct because jit sees the global
  batch and XLA inserts the ICI collectives.
- Semi-supervised state (EMA teacher, CoMatch memory bank, distribution
  alignment buffer) is carried as pytrees through the step function instead of
  Python-side mutation.

Reference behavior contracts are cited throughout as
``/root/reference/code/<file>:<line>``.
"""

__version__ = "0.1.0"
