"""LLM paths: video-prefix language models and the Video-ChatGPT pipeline.

Covers the reference's three LLM integrations (SURVEY §2.9-2.13):

  * :mod:`stair_tpu.llm.decoder` — a decoder-only transformer family
    parameterized to match GPT-2 (learned positions, LayerNorm, GELU) or
    Llama (RoPE, RMSNorm, SwiGLU, GQA), running on the Pallas prefix-LM
    flash-attention kernel, with LoRA adapters and KV-cache generation;
  * :mod:`stair_tpu.llm.import_weights` — HF checkpoint converters
    (GPT-2 / Llama state dicts -> param pytrees);
  * :mod:`stair_tpu.llm.video_prefix` — the VideoGPT2/with_pt path: video
    features as an always-visible prefix, answer-span LM loss, optional
    video-regression loss, STAIR filter-output prompt splicing;
  * :mod:`stair_tpu.llm.videochat` — the Video-ChatGPT path: CLIP ViT
    features, spatio-temporal pooling, mm_projector token splice,
    conversation templates, batched generation.
"""
