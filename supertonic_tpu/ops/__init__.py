from .attention import fused_attention, fused_attention_interpret

__all__ = ["fused_attention", "fused_attention_interpret"]
