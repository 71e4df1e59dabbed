from .registry import get_lm, get_lm_config, normalize_lm_type
