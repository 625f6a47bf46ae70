from endoscopy_tpu.ckpt.orbax_io import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from endoscopy_tpu.ckpt.transfer import (
    apply_pretrain,
    carry_stage_weights,
    graft_tree,
    load_pretrained_into,
)

__all__ = ["latest_checkpoint", "restore_checkpoint", "save_checkpoint",
           "apply_pretrain", "carry_stage_weights", "graft_tree",
           "load_pretrained_into"]
