"""Net2NetTransformer: frozen tokenizer -> token ids -> GPT, plus the
conditioning encoders.

Reference: /root/reference/OmniTokenizer/lm_transformer.py:19-459 and
modules/encoders.py:12-51.  Vocabulary layout: [sos?][cond vocab][codebook]
— z ids are offset by cond_stage_vocab_size (+1 with sos), lm_transformer.py
:142-147.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Net2NetConfig
from .gpt import GPT, make_cfg_sampler, make_sampler
from .wrapper import OmniTokenizerVQGAN


# -- conditioning encoders (encoders.py) ------------------------------------

def labelator_encode(labels: jnp.ndarray) -> jnp.ndarray:
    """class ids (B,) -> token column (B, 1)."""
    return labels.reshape(-1, 1).astype(jnp.int32)


def sos_encode(batch: int, sos_token: int = 0) -> jnp.ndarray:
    return jnp.full((batch, 1), sos_token, jnp.int32)


class Net2NetTransformer:
    """LM over tokenizer codes.  Holds a frozen tokenizer wrapper + GPT
    params; training/eval methods are pure and jitted."""

    def __init__(self, cfg: Net2NetConfig, tokenizer: OmniTokenizerVQGAN,
                 gpt_params: Optional[Any] = None, seed: int = 0,
                 cond_stage_model: Optional[OmniTokenizerVQGAN] = None):
        if cfg.unconditional and cfg.starts_with_sos:
            # the reference FORCES starts_with_sos off when unconditional
            # (lm_transformer.py:57-58): the sos token 0 is prepended anyway
            # but shares id space with code 0 — no vocab slot, no +1 offset.
            # Keeping the flag set would offset targets past vocab_size and
            # produce NaN cross-entropy.
            import dataclasses
            cfg = dataclasses.replace(cfg, starts_with_sos=False)
        self.cfg = cfg
        self.tokenizer = tokenizer
        # second tokenizer for 'stft' conditioning (lm_transformer.py:115-122)
        self.cond_stage_model = cond_stage_model
        self.gpt = GPT(cfg.gpt)
        if gpt_params is None:
            dummy = jnp.zeros((1, min(8, cfg.gpt.block_size)), jnp.int32)
            gpt_params = self.gpt.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.gpt_params = gpt_params

    # -- vocab bookkeeping (lm_transformer.py:57-63,142-147) ---------------
    @property
    def cond_vocab(self) -> int:
        if self.cfg.unconditional:
            return 0
        return self.cfg.class_cond_dim

    @property
    def z_offset(self) -> int:
        return self.cond_vocab + (1 if self.cfg.starts_with_sos else 0)

    # -- token pipeline ----------------------------------------------------
    def encode_to_z(self, x, is_image: bool) -> jnp.ndarray:
        """pixels -> flat codebook ids (B, N)."""
        enc = self.tokenizer.encode(x, is_image)
        if self.cfg.sample_every_n_latent_frames > 0:
            enc = enc[:, :: self.cfg.sample_every_n_latent_frames]
        return enc.reshape(enc.shape[0], -1).astype(jnp.int32)

    def encode_to_c(self, cond, is_image: bool = True) -> jnp.ndarray:
        """Condition -> token column(s) (lm_transformer.py:270-279):
        'label' class ids (B,), 'text' pre-tokenized ids (B, L) passthrough
        (Identity), 'stft' a second tokenizer's flat codes."""
        key = self.cfg.cond_stage_key
        if self.cfg.unconditional:
            return sos_encode(jnp.asarray(cond).shape[0], self.cfg.sos_token)
        if key == "label":
            return labelator_encode(jnp.asarray(cond))
        if key == "text":
            return jnp.asarray(cond, jnp.int32).reshape(jnp.asarray(cond).shape[0], -1)
        if key == "stft":
            assert self.cond_stage_model is not None, "stft conditioning needs cond_stage_model"
            enc = self.cond_stage_model.encode(cond, is_image)
            return enc.reshape(enc.shape[0], -1).astype(jnp.int32)
        raise NotImplementedError(key)

    def build_sequence(self, z_ids: jnp.ndarray, labels: Optional[jnp.ndarray],
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        """Returns (cz_indices, targets, prefix_len) per
        lm_transformer.py:136-192.  `labels` may be class ids (B,) or
        pre-encoded condition columns (B, L)."""
        cfg = self.cfg
        B = z_ids.shape[0]
        z = z_ids + self.z_offset
        if cfg.unconditional:
            c = sos_encode(B, cfg.sos_token)
            cz = jnp.concatenate([c, z], axis=1)
            prefix = c.shape[1] - 1
        elif cfg.starts_with_sos:
            labels = jnp.asarray(labels)
            c = (labels.reshape(B, -1).astype(jnp.int32)
                 if labels.ndim > 1 else labelator_encode(labels)) + 1
            sos = sos_encode(B, cfg.sos_token)
            if cfg.class_first:
                cz = jnp.concatenate([c, sos, z], axis=1)
            else:
                cz = jnp.concatenate([sos, c, z], axis=1)
            prefix = 1 + c.shape[1] - 1
        else:
            labels = jnp.asarray(labels)
            c = (labels.reshape(B, -1).astype(jnp.int32)
                 if labels.ndim > 1 else labelator_encode(labels))
            cz = jnp.concatenate([c, z], axis=1)
            prefix = c.shape[1] - 1
        return cz, z_ids, prefix

    # -- training loss -----------------------------------------------------
    def loss_fn(self, gpt_params, z_ids, labels, pkeep_rng=None):
        cfg = self.cfg
        if pkeep_rng is not None and cfg.pkeep < 1.0:
            k1, k2 = jax.random.split(pkeep_rng)
            keep = jax.random.bernoulli(k1, cfg.pkeep, z_ids.shape)
            rand = jax.random.randint(k2, z_ids.shape, 0, cfg.gpt.vocab_size)
            # corruption applies to OFFSET ids in the reference (:149-154)
            z_in = jnp.where(keep, z_ids + self.z_offset, rand) - self.z_offset
        else:
            z_in = z_ids
        cz, target, prefix = self.build_sequence(z_in, labels)
        logits, _ = self.gpt.apply({"params": gpt_params}, cz[:, :-1])
        logits = logits[:, prefix:]
        target = target + self.z_offset
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, logits.shape[-1]), target.reshape(-1)).mean()
        top1 = (jnp.argmax(logits, -1) == target).mean()
        top5 = jnp.mean(jnp.any(
            jax.lax.top_k(logits, 5)[1] == target[..., None], axis=-1))
        return loss, dict(loss=loss, acc1=top1 * 100, acc5=top5 * 100)

    # -- generation --------------------------------------------------------
    def _serving_gpt_cfg(self, int8: bool):
        """(gpt_cfg, quant): int8=True flips on the W8A8 decode path and
        builds the quantized weight collection (ops/int8.py)."""
        if not int8:
            return self.cfg.gpt, None
        import dataclasses

        from ..ops.int8 import quantize_gpt_decode_params

        gcfg = dataclasses.replace(self.cfg.gpt, int8_decode=True)
        return gcfg, quantize_gpt_decode_params(self.gpt_params, gcfg.n_layer)

    def make_class_conditional_sampler(self, steps: int, temperature: float = 1.0,
                                       top_k: Optional[int] = None, top_p: float = 1.0,
                                       cfg_ratio: float = 1.5, use_cfg: bool = True,
                                       scale_cfg: bool = True,
                                       bucket: Optional[int] = None,
                                       int8: bool = False,
                                       cache_sharding=None):
        """Returns sample(cls_ids (B,), key) -> clamped codebook ids (B, steps)
        (transformer_eval.py:27-91 semantics incl. the final clamp).
        `scale_cfg` grows the guidance scale linearly with the step — the
        reference DEFAULT (scale_cfg=not args.no_scale_cfg,
        transformer_eval.py:240)."""
        cfg = self.cfg
        gpt_cfg, quant = self._serving_gpt_cfg(int8)
        if use_cfg and cfg.starts_with_sos:
            sampler = make_cfg_sampler(
                gpt_cfg, steps, temperature, top_k, top_p,
                cfg_ratio=cfg_ratio, class_first=cfg.class_first,
                scale_cfg=scale_cfg, bucket=bucket,
                cache_sharding=cache_sharding)

            def sample(cls_ids, key):
                toks = sampler(self.gpt_params, cls_ids.reshape(-1, 1), key,
                               quant=quant)
                return jnp.clip(toks - self.z_offset, 0,
                                cfg.first_stage_vocab_size - 1)
        else:
            sampler = make_sampler(gpt_cfg, steps, temperature, top_k, top_p,
                                   bucket=bucket, cache_sharding=cache_sharding)

            def sample(cls_ids, key):
                if cfg.unconditional:
                    prefix = sos_encode(cls_ids.shape[0], cfg.sos_token)
                else:
                    prefix = labelator_encode(cls_ids)
                toks = sampler(self.gpt_params, prefix, key, quant=quant)
                return jnp.clip(toks - self.z_offset, 0,
                                cfg.first_stage_vocab_size - 1)

        return sample

    def decode_to_pixels(self, ids: jnp.ndarray, is_image: bool):
        return self.tokenizer.decode(ids, is_image)

    # -- frame prediction (transformer_eval.py:93-134) ---------------------
    def make_frame_prediction_sampler(self, total_latent_frames: int,
                                      prefix_latent_frames: int = 2,
                                      temperature: float = 1.0,
                                      top_k: Optional[int] = None, top_p: float = 1.0,
                                      bucket: Optional[int] = None,
                                      int8: bool = False):
        """Encode a video, keep the first `prefix_latent_frames` latent
        frames, AR-continue the rest, return full id grid (B, t, h, w)."""
        hw = self.tokenizer.cfg.latent_hw
        steps = (total_latent_frames - prefix_latent_frames) * hw * hw
        gpt_cfg, quant = self._serving_gpt_cfg(int8)
        sampler = make_sampler(gpt_cfg, steps, temperature, top_k, top_p,
                               bucket=bucket)

        def sample(video, key):
            z = self.encode_to_z(video, is_image=False) + self.z_offset
            prefix_len = prefix_latent_frames * hw * hw
            prefix = z[:, :prefix_len]
            if self.cfg.starts_with_sos or self.cfg.unconditional:
                sos = sos_encode(z.shape[0], self.cfg.sos_token)
                prefix = jnp.concatenate([sos, prefix], axis=1)
            cont = sampler(self.gpt_params, prefix, key, quant=quant)
            cont = jnp.clip(cont - self.z_offset, 0,
                            self.cfg.first_stage_vocab_size - 1)
            full = jnp.concatenate([z[:, :prefix_len] - self.z_offset, cont], axis=1)
            return full.reshape(z.shape[0], total_latent_frames, hw, hw)

        return sample
