"""Video-ChatGPT path: CLIP features -> spatio-temporal tokens -> Llama.

The TPU-native rebuild of SURVEY §2.10-2.12 (yellow-binary-tree/STAIR
``video_chatgpt/``): raw video frames are encoded by the CLIP tower
(:mod:`stair_tpu.llm.clip`), pooled into 100 temporal + S spatial tokens
(``inference.py:12-43``), projected by ``mm_projector`` and spliced into the
Llama embedding stream over the ``<vid_patch>`` span
(``model/video_chatgpt.py:78-153``). Generation uses the decoder's masked
sampler with keyword stopping (``model/utils.py``).

The reference splices by scanning token ids per example in Python; here the
splice is a single ``dynamic_update_slice`` at a per-example start index
(the patch span is constructed by the prompt builder, so its offset is known
on the host), keeping the whole forward jittable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from stair_tpu.llm.clip import ClipVisionConfig, ClipVisionTower
from stair_tpu.llm.decoder import Decoder, DecoderConfig
from stair_tpu.models.modules import _init_linear, linear

DEFAULT_VIDEO_TOKEN = "<video>"
DEFAULT_VIDEO_PATCH_TOKEN = "<vid_patch>"
DEFAULT_VID_START_TOKEN = "<vid_start>"
DEFAULT_VID_END_TOKEN = "<vid_end>"


def spatio_temporal_pool(features, max_temporal: int = 100):
    """[T, S, C] frame-patch features -> [max_temporal + S, C] tokens.

    Temporal tokens: per-frame spatial means, zero-padded to
    ``max_temporal``; spatial tokens: per-patch temporal means.
    ref: video_chatgpt/inference.py:12-43
    """
    t, s, c = features.shape
    temporal = jnp.mean(features, axis=1)
    if t < max_temporal:
        temporal = jnp.concatenate(
            [temporal, jnp.zeros((max_temporal - t, c), temporal.dtype)]
        )
    else:
        temporal = temporal[:max_temporal]
    spatial = jnp.mean(features, axis=0)
    return jnp.concatenate([temporal, spatial], axis=0)


@dataclass(frozen=True)
class VideoChatConfig:
    decoder: DecoderConfig
    vision: ClipVisionConfig
    max_temporal: int = 100
    use_vid_start_end: bool = True

    @property
    def video_token_len(self):
        return self.max_temporal + self.vision.num_patches


class VideoChatModel:
    """mm_projector + Llama decoder over spliced video tokens."""

    def __init__(self, config: VideoChatConfig):
        self.config = config
        self.decoder = Decoder(config.decoder)
        self.vision = ClipVisionTower(config.vision)

    def init(self, rng, decoder_params=None, vision_params=None):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "decoder": decoder_params or self.decoder.init(k1),
            "vision": vision_params or self.vision.init(k2),
            "mm_projector": _init_linear(
                k3, self.config.vision.d_model, self.config.decoder.d_model
            ),
        }

    def encode_video(self, params, frames):
        """[T, H, W, 3] normalized frames -> [video_token_len, vision_d]."""
        feats = self.vision.patch_features(params["vision"], frames)
        return spatio_temporal_pool(feats, self.config.max_temporal)

    def splice_embeds(self, params, token_ids, video_tokens, splice_start):
        """Project video tokens and write them over the patch span.

        token_ids [B, L]; video_tokens [B, V, vision_d];
        splice_start [B] — first ``<vid_patch>`` position.
        """
        embeds = params["decoder"]["embed"][token_ids]
        projected = linear(params["mm_projector"], video_tokens)

        def one(e, v, s):
            return jax.lax.dynamic_update_slice(e, v.astype(e.dtype), (s, 0))

        return jax.vmap(one)(embeds, projected, splice_start)

    def forward(self, params, token_ids, video_tokens, splice_start,
                valid_len):
        embeds = self.splice_embeds(
            params, token_ids, video_tokens, splice_start
        )
        B = embeds.shape[0]
        hidden = self.decoder.hidden_states(
            params["decoder"], embeds,
            jnp.zeros((B,), jnp.int32), valid_len.astype(jnp.int32),
        )
        return self.decoder.logits_from_hidden(params["decoder"], hidden)

    def sft_loss(self, params, batch):
        """Supervised fine-tuning: CE on non-masked targets (the trainer
        masks everything but assistant replies, ref train/train.py:239-301).

        batch: token_ids [B, L], labels [B, L] (-1 ignored), video_tokens,
        splice_start, valid_len.
        """
        logits = self.forward(
            params, batch["token_ids"], batch["video_tokens"],
            batch["splice_start"], batch["valid_len"],
        )
        labels = batch["labels"]
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        mask = (shift_labels >= 0).astype(jnp.float32)
        safe = jnp.maximum(shift_labels, 0)
        lse = jax.nn.logsumexp(shift_logits, axis=-1)
        picked = jnp.take_along_axis(
            shift_logits, safe[..., None], axis=-1
        )[..., 0]
        return jnp.sum((lse - picked) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0
        )

    def generate(self, params, token_ids, video_tokens, splice_start,
                 prompt_len, max_new_tokens=64, temperature=0.2, rng=None,
                 eos_id=None):
        embeds = self.splice_embeds(
            params, token_ids, video_tokens, splice_start
        )
        return self.decoder.generate(
            params["decoder"], embeds, prompt_len, max_new_tokens,
            temperature=temperature, rng=rng, eos_id=eos_id,
        )


# ---------------------------------------------------------------------------
# Prompt building + stopping
# ---------------------------------------------------------------------------

def build_video_prompt(question: str, video_token_len: int,
                       use_start_end: bool = True) -> str:
    """Insert the video placeholder block into the question.
    ref: video_chatgpt/inference.py:66-75"""
    if use_start_end:
        block = (
            DEFAULT_VID_START_TOKEN
            + DEFAULT_VIDEO_PATCH_TOKEN * video_token_len
            + DEFAULT_VID_END_TOKEN
        )
    else:
        block = DEFAULT_VIDEO_PATCH_TOKEN * video_token_len
    return question + "\n" + block


class KeywordsStoppingCriteria:
    """Stop generation when any keyword appears in the decoded suffix.
    ref: video_chatgpt/model/utils.py"""

    def __init__(self, keywords, tokenizer, prompt_len: int):
        self.keywords = keywords
        self.tokenizer = tokenizer
        self.prompt_len = prompt_len

    def truncate(self, text: str) -> str:
        for kw in self.keywords:
            idx = text.find(kw)
            if idx >= 0:
                text = text[:idx]
        return text.strip()
