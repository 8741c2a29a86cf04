from .fused_attention import fused_attention, use_fused_attention  # noqa: F401
