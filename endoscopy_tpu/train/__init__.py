from endoscopy_tpu.train.state import TrainState, create_train_state

__all__ = ["TrainState", "create_train_state"]
