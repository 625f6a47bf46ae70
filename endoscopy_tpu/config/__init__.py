from endoscopy_tpu.config.loader import AttrDict, get_config, is_none, load_yaml

__all__ = ["AttrDict", "get_config", "is_none", "load_yaml"]
