from .groupnorm_swish import group_norm_swish

__all__ = ["group_norm_swish"]
