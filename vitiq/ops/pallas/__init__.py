from vitiq.ops.pallas.flash_attention import fused_attention  # noqa: F401
