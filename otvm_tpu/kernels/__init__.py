from .memory_attn import memory_read  # noqa: F401
