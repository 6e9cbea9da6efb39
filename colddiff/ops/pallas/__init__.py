from .groupnorm import group_norm_swish, group_norm_swish_reference  # noqa: F401
from .linear_attention import linear_attention, linear_attention_reference  # noqa: F401
