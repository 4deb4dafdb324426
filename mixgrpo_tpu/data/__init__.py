from mixgrpo_tpu.data.dataset import (
    EmbeddingCacheWriter,
    LatentDataset,
    PromptLoader,
)

__all__ = ["EmbeddingCacheWriter", "LatentDataset", "PromptLoader"]
