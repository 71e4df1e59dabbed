from .activations import parse_act_fn, geglu, quick_gelu, gelu_new
from .layernorm import layer_norm, rms_norm
from .attention import multi_head_attention, dot_product_attention
from . import sampling
