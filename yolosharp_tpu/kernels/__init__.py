from .attention import attention_bihd, fused_attention

__all__ = ["attention_bihd", "fused_attention"]
