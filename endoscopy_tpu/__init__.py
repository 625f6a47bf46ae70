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

import os as _os

if _os.environ.get("ETPU_PLATFORM"):
    # Opt-in backend override for CLI/tool runs (e.g. ETPU_PLATFORM=cpu for
    # host-only smoke tests). The runtime-config route is used instead of
    # JAX_PLATFORMS because environments that pre-register a PJRT plugin in
    # sitecustomize may overwrite JAX_PLATFORMS at `import jax` time; the
    # explicit config update always wins as long as no backend has been
    # initialized yet — package import is early enough for every CLI here.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ETPU_PLATFORM"])
    if _os.environ.get("ETPU_CPU_DEVICES"):
        _jax.config.update("jax_num_cpu_devices",
                           int(_os.environ["ETPU_CPU_DEVICES"]))
