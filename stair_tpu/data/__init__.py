"""Host-side input pipeline: embeddings, video features, batch packing."""

from stair_tpu.data.dataset import AGQADataset, Batcher  # noqa: F401
