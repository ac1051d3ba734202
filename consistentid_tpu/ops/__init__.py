from .attention import dot_product_attention, merge_heads, reference_attention, split_heads
from .flash_attention import flash_attention
