"""LatteT2V text-to-video sampling CLI — analogue of
/root/reference/Diffusion/Latte/sample/sample_t2v.py +
sample/pipeline_videogen.py (VideoGenPipeline).

Reference semantics reproduced:
  - T5 prompt encoding with padding/truncation to 120 tokens and the
    attention mask carried into cross-attention
    (pipeline_videogen.py:210-258)
  - classifier-free guidance with the empty/negative prompt, batch order
    [uncond, text], eps = uncond + scale * (text - uncond)
    (pipeline_videogen.py:687-718)
  - the learned-variance half of the model output is DROPPED and the
    scheduler runs fixed-variance (pipeline_videogen.py:720-722 quirk)
  - linear beta schedule 1e-4..2e-2 (configs/t2v/t2v_sample.yaml)

Differences, by design:
  - samplers are this repo's oracle-proven IDDPM loops (ddim<N> respacing /
    fixed-small-sigma ancestral) instead of the diffusers scheduler zoo —
    PNDM/DPM-Solver indexing is a diffusers-internal convention we don't
    vendor; DDIM here follows the OpenAI respacing the rest of the repo is
    parity-tested against.
  - the first-stage decode seam is the OmniTokenizer VAE (`--vae_ckpt`,
    in_channels=8) or raw-latent npy output; the reference's SD VAE weights
    are not available in this environment.
  - `--t5_dir` loads any local HuggingFace T5 encoder; without it a
    deterministic byte-embedding fallback keeps the full pipeline drivable
    (smoke tests / environments without T5 weights).  The reference's
    `clean_caption` needs bs4+ftfy; we apply the basic-clean subset.
"""

from __future__ import annotations

import argparse
import html
import json
import os
import re

import numpy as np

from . import args as A


def build_parser():
    p = argparse.ArgumentParser("latte_t2v_sample")
    p.add_argument("--ckpt", type=str, default=None,
                   help="LatteT2V weights: torch .pt state dict or flax msgpack")
    p.add_argument("--model_config", type=str, default=None,
                   help="PixArt transformer config.json (from_pretrained_2d)")
    p.add_argument("--num_layers", type=int, default=28)
    p.add_argument("--num_attention_heads", type=int, default=16)
    p.add_argument("--attention_head_dim", type=int, default=72)
    p.add_argument("--cross_attention_dim", type=int, default=1152)
    p.add_argument("--caption_channels", type=int, default=4096)
    p.add_argument("--in_channels", type=int, default=4)
    p.add_argument("--out_channels", type=int, default=8)
    p.add_argument("--patch_size", type=int, default=2)
    p.add_argument("--activation_fn", type=str, default="gelu-approximate")
    p.add_argument("--no_attention_bias", dest="attention_bias",
                   action="store_false", default=True)
    p.add_argument("--norm_eps", type=float, default=1e-6)
    p.add_argument("--image_size", type=int, default=512,
                   help="pixel size; latent = image_size // 8")
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--text_prompt", type=str, nargs="+",
                   default=["a corgi running on the beach"])
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_sampling_steps", type=int, default=50)
    p.add_argument("--sample_method", type=str, default="ddim",
                   choices=["ddim", "ddpm"])
    p.add_argument("--beta_schedule", type=str, default="linear")
    p.add_argument("--enable_temporal_attentions", action="store_true",
                   default=True)
    p.add_argument("--disable_temporal_attentions",
                   dest="enable_temporal_attentions", action="store_false")
    p.add_argument("--t5_dir", type=str, default=None,
                   help="local HF dir with a T5 encoder (and tokenizer)")
    p.add_argument("--max_token_length", type=int, default=120)
    p.add_argument("--vae_ckpt", type=str, default=None,
                   help="OmniTokenizer VAE for pixel decode (8-ch latents)")
    p.add_argument("--save_img_path", type=str, default="./sample_videos/t2v")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    return p


_WS = re.compile(r"\s+")


def basic_clean(text: str) -> str:
    """pipeline_videogen._clean_caption's html/whitespace subset (the full
    version additionally needs ftfy + BeautifulSoup)."""
    return _WS.sub(" ", html.unescape(html.unescape(text))).strip()


def encode_prompts(args, prompts):
    """prompts -> (embeddings (B, L, caption_channels), mask (B, L))."""
    prompts = [basic_clean(t) for t in prompts]
    L = args.max_token_length
    if args.t5_dir:
        import torch
        from transformers import T5EncoderModel

        enc = T5EncoderModel.from_pretrained(args.t5_dir)
        enc.eval()
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.t5_dir)
            batch = tok(prompts, padding="max_length", max_length=L,
                        truncation=True, add_special_tokens=True,
                        return_tensors="pt")
            ids, mask = batch.input_ids, batch.attention_mask
        except Exception:  # no tokenizer files: byte-ids into the T5 vocab
            vocab = enc.config.vocab_size
            ids, mask = _byte_ids(prompts, L)
            ids = torch.as_tensor(ids % vocab)
            mask = torch.as_tensor(mask)
        with torch.no_grad():
            emb = enc(input_ids=ids,
                      attention_mask=mask).last_hidden_state.float().numpy()
        return emb, np.asarray(mask)
    # deterministic byte-embedding fallback: ids = utf-8 bytes + 1, table
    # fixed by seed 0 — keeps the T5 seam exercisable without weights
    import jax

    ids, mask = _byte_ids(prompts, L)
    table = np.asarray(jax.random.normal(
        jax.random.PRNGKey(0), (257, args.caption_channels))) * 0.02
    return table[ids], mask


def _byte_ids(prompts, L):
    ids = np.zeros((len(prompts), L), np.int64)
    mask = np.zeros((len(prompts), L), np.int64)
    for i, t in enumerate(prompts):
        bs = list(t.encode("utf-8"))[: L]
        ids[i, : len(bs)] = np.asarray(bs, np.int64) + 1
        mask[i, : max(len(bs), 1)] = 1  # empty prompt keeps one live slot
    return ids, mask


def load_t2v_config(args, dtype):
    from ..models.latte_t2v import LatteT2VConfig

    kw = dict(num_attention_heads=args.num_attention_heads,
              attention_head_dim=args.attention_head_dim,
              in_channels=args.in_channels, out_channels=args.out_channels,
              num_layers=args.num_layers,
              cross_attention_dim=args.cross_attention_dim,
              attention_bias=args.attention_bias,
              sample_size=args.image_size // 8, patch_size=args.patch_size,
              activation_fn=args.activation_fn, norm_eps=args.norm_eps,
              norm_elementwise_affine=False,
              caption_channels=args.caption_channels,
              video_length=args.video_length)
    if args.model_config:
        with open(args.model_config) as f:
            raw = json.load(f)
        for k in list(kw):
            if k in raw:
                kw[k] = raw[k]
        kw["video_length"] = args.video_length  # from_pretrained_2d override
    return LatteT2VConfig(dtype=dtype, **kw)


def main(argv=None):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..diffusion import create_diffusion
    from ..models.latte_t2v import LatteT2V, convert_latte_t2v_state
    from ..utils.media import save_video_grid

    args = build_parser().parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = load_t2v_config(args, dtype)
    model = LatteT2V(cfg)
    lat = cfg.sample_size
    B = len(args.text_prompt)
    C = cfg.in_channels

    pos_emb, pos_mask = encode_prompts(args, args.text_prompt)
    neg_emb, neg_mask = encode_prompts(args, [args.negative_prompt] * B)

    ex = jnp.zeros((1, args.video_length, lat, lat, C))
    variables = model.init(
        jax.random.PRNGKey(0), ex, jnp.zeros((1,), jnp.int32),
        encoder_hidden_states=jnp.zeros((1, args.max_token_length,
                                         cfg.caption_channels)))
    if args.ckpt:
        if args.ckpt.endswith((".pt", ".pth", ".ckpt")):
            from ..models.dit import load_torch_diffusion_state_dict

            sd = load_torch_diffusion_state_dict(args.ckpt, use_ema=True)
            params = serialization.from_state_dict(
                variables["params"], convert_latte_t2v_state(sd))
        else:
            with open(args.ckpt, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            params = serialization.from_state_dict(
                variables["params"], raw.get("params", raw))
    else:
        params = variables["params"]
        print("[t2v] WARNING: no --ckpt; sampling from random weights")

    do_cfg = args.guidance_scale > 1.0
    if do_cfg:  # [uncond, text] batch order (pipeline_videogen.py:687,717)
        ctx = jnp.asarray(np.concatenate([neg_emb, pos_emb]))
        mask = jnp.asarray(np.concatenate([neg_mask, pos_mask]))
    else:
        ctx = jnp.asarray(pos_emb)
        mask = jnp.asarray(pos_mask)

    def eps_fn(x, t):
        xin = jnp.concatenate([x, x]) if do_cfg else x
        tin = jnp.concatenate([t, t]) if do_cfg else t
        out = model.apply(
            {"params": params}, xin, tin, encoder_hidden_states=ctx,
            encoder_attention_mask=mask,
            enable_temporal_attentions=args.enable_temporal_attentions)
        if do_cfg:
            u, c = jnp.split(out, 2, axis=0)
            out = u + args.guidance_scale * (c - u)
        return out[..., :C]  # learned sigma dropped (:720-722)

    respacing = (f"ddim{args.num_sampling_steps}"
                 if args.sample_method == "ddim"
                 else str(args.num_sampling_steps))
    diffusion = create_diffusion(respacing, noise_schedule=args.beta_schedule,
                                 learn_sigma=False, sigma_small=True)
    loop = (diffusion.ddim_sample_loop if args.sample_method == "ddim"
            else diffusion.p_sample_loop)
    shape = (B, args.video_length, lat, lat, C)
    z = loop(eps_fn, shape, jax.random.PRNGKey(args.seed),
             clip_denoised=False)

    os.makedirs(args.save_img_path, exist_ok=True)
    if args.vae_ckpt:
        from .diffusion_common import decode_batch_fn, load_vae_adapter

        decode = decode_batch_fn(load_vae_adapter(args), video=True)
        x = np.asarray(decode(z))
        for i, prompt in enumerate(args.text_prompt):
            name = re.sub(r"\W+", "_", prompt)[:40] or f"sample_{i}"
            save_video_grid(x[i:i + 1] + 0.5,
                            os.path.join(args.save_img_path, name + ".mp4"))
    else:
        out = os.path.join(args.save_img_path, "latents.npy")
        np.save(out, np.asarray(z, np.float32))
        print(f"[t2v] saved latents {z.shape} -> {out}")
    return np.asarray(z)


if __name__ == "__main__":
    main()
