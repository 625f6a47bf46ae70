from endoscopy_tpu.ssl_state.ema import ema_init, ema_set, ema_update
from endoscopy_tpu.ssl_state.comatch_state import CoMatchState, comatch_state_init

__all__ = ["ema_init", "ema_set", "ema_update", "CoMatchState", "comatch_state_init"]
