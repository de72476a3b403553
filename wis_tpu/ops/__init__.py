from wis_tpu.ops.attention import mha, qkv_heads, merge_heads

__all__ = ["mha", "qkv_heads", "merge_heads"]
