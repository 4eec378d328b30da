from tmac_tpu.models.config import ModelConfig, QuantConfig, PRESETS, get_preset  # noqa: F401
