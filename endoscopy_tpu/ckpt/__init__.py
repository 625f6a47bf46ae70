from endoscopy_tpu.ckpt.orbax_io import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = ["latest_checkpoint", "restore_checkpoint", "save_checkpoint"]
