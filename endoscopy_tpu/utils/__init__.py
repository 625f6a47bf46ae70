from endoscopy_tpu.utils.meters import AverageMeter

__all__ = ["AverageMeter", "count_parameters"]


def __getattr__(name):
    # lazy: trees imports jax; keep jax out of jax-free consumers
    # (utils.plotting for the EDA CLI)
    if name == "count_parameters":
        from endoscopy_tpu.utils.trees import count_parameters
        return count_parameters
    raise AttributeError(name)
