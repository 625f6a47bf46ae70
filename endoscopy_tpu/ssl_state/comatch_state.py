"""CoMatch carried state: memory bank + distribution-alignment buffer.

Pure-pytree re-design of the Python-side mutable state in the reference
CoMatch trainer (comatch.py:90-96 queue, comatch.py:167-174 prob_list):

- queue_feats (queue_size, low_dim) / queue_probs (queue_size, num_classes)
  ring buffer with an integer pointer; updated inside the jitted step with the
  ``n == queue_size`` gate and labeled one-hot injection of comatch.py:187-196.
- DA buffer: the trailing-32 list of batch-mean probabilities becomes a fixed
  (32, num_classes) ring with a fill counter, averaged with masking — same
  trailing-window semantics without Python list mutation.

Under data parallelism the state is replicated; the batch entering the queue
is the *global* batch (jit sees it whole), which matches the reference's
single-device global queue (SURVEY.md §2.3).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class CoMatchState:
    queue_feats: jnp.ndarray  # (queue_size, low_dim)
    queue_probs: jnp.ndarray  # (queue_size, num_classes)
    queue_ptr: jnp.ndarray    # () int32
    da_buffer: jnp.ndarray    # (da_len, num_classes)
    da_ptr: jnp.ndarray       # () int32
    da_count: jnp.ndarray     # () int32


def comatch_state_init(queue_size: int, low_dim: int, num_classes: int,
                       da_len: int = 32) -> CoMatchState:
    return CoMatchState(
        queue_feats=jnp.zeros((queue_size, low_dim), jnp.float32),
        queue_probs=jnp.zeros((queue_size, num_classes), jnp.float32),
        queue_ptr=jnp.zeros((), jnp.int32),
        da_buffer=jnp.zeros((da_len, num_classes), jnp.float32),
        da_ptr=jnp.zeros((), jnp.int32),
        da_count=jnp.zeros((), jnp.int32),
    )
