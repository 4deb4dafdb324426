from mixgrpo_tpu.ops.attention import attention

__all__ = ["attention"]
