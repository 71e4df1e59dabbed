from .fused_attention import fused_attention
