"""Folded patchify / un-patchify fast-path parity: bf16 fast vs reference
path with identical parameter trees (ops/patch_fold.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.config import TokenizerConfig
from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet
from omnitokenizer_tpu.ops.patch_fold import fast_to_pixels, folded_patch_embed

SMALL = TokenizerConfig(
    embedding_dim=64, n_codes=32, codebook_dim=4, resolution=32,
    sequence_length=5, patch_size=4, temporal_patch_size=2,
    enc_block="tw", dec_block="tt", dim_head=16, heads=4,
)


def _nets(fast: bool):
    cfg = SMALL.replace(dtype=jnp.bfloat16, fast_patchify=fast)
    return OmniTokenizerNet(cfg)


def test_param_trees_identical():
    x = jnp.zeros((1, 5, 32, 32, 3))
    v_fast = _nets(True).init(jax.random.PRNGKey(0), x, False)
    v_slow = _nets(False).init(jax.random.PRNGKey(0), x, False)
    p_fast = jax.tree_util.tree_map(np.asarray, v_fast["params"])
    p_slow = jax.tree_util.tree_map(np.asarray, v_slow["params"])
    flat_f = jax.tree_util.tree_leaves_with_path(p_fast)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(p_slow))
    assert len(flat_f) == len(flat_s)
    for path, leaf in flat_f:
        assert path in flat_s, f"missing {path}"
        np.testing.assert_array_equal(leaf, flat_s[path], err_msg=str(path))


def test_fast_path_matches_reference_path_bf16():
    """Continuous (pre-VQ) encoder latents: the fast path must be at least as
    close to the exact f32 result as the reference bf16 path is.  (Comparing
    post-VQ reconstructions is meaningless in bf16 — rounding flips discrete
    code assignments.)"""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32, 32, 3) * 0.3, jnp.float32)
    net_f, net_s = _nets(True), _nets(False)
    net32 = OmniTokenizerNet(SMALL)  # f32 exact
    variables = net_s.init(jax.random.PRNGKey(0), x, False)

    z_s = np.asarray(net_s.apply(variables, x, False, method="encode_latent"), np.float32)
    z_f = np.asarray(net_f.apply(variables, x, False, method="encode_latent"), np.float32)
    z32 = np.asarray(net32.apply(variables, x, False, method="encode_latent"), np.float32)

    scale = np.abs(z32).mean()
    err_s = np.abs(z_s - z32).mean() / scale
    err_f = np.abs(z_f - z32).mean() / scale
    assert err_f < max(2 * err_s, 0.05), (err_f, err_s)
    assert np.corrcoef(z_f.ravel(), z_s.ravel())[0, 1] > 0.99


def test_folded_patch_embed_math():
    """Fold == rearrange -> LN -> dense, computed manually in f64."""
    rng = np.random.RandomState(1)
    B, T, H, W, C = 1, 4, 8, 8, 3
    pt, p, D = 2, 4, 16
    feat = C * pt * p * p
    x = rng.randn(B, T, H, W, C).astype(np.float32)
    gamma = rng.randn(feat).astype(np.float32) * 0.1 + 1.0
    beta = rng.randn(feat).astype(np.float32) * 0.1
    kernel = rng.randn(feat, D).astype(np.float32) * 0.1
    bias = rng.randn(D).astype(np.float32) * 0.1

    out = np.asarray(folded_patch_embed(
        jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
        jnp.asarray(kernel), jnp.asarray(bias), pt, p, jnp.float32), np.float32)

    # manual reference: channel-major patch features
    xr = x.reshape(B, T // pt, pt, H // p, p, W // p, p, C)
    patches = xr.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(B, T // pt, H // p, W // p, feat)
    mu = patches.mean(-1, keepdims=True)
    var = ((patches - mu) ** 2).mean(-1, keepdims=True)
    ln = (patches - mu) / np.sqrt(var + 1e-5) * gamma + beta
    want = ln @ kernel + bias
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_fast_to_pixels_math():
    rng = np.random.RandomState(2)
    B, t, h, w, D = 1, 2, 4, 4, 16
    pt, p, C = 2, 4, 3
    feat = C * pt * p * p
    tok = rng.randn(B, t, h, w, D).astype(np.float32)
    kernel = rng.randn(D, feat).astype(np.float32) * 0.1
    bias = rng.randn(feat).astype(np.float32) * 0.1

    out = np.asarray(fast_to_pixels(
        jnp.asarray(tok), jnp.asarray(kernel), jnp.asarray(bias),
        pt, p, C, jnp.float32), np.float32)

    y = tok @ kernel + bias  # (B,t,h,w,(c pt p1 p2))
    yr = y.reshape(B, t, h, w, C, pt, p, p)
    want = yr.transpose(0, 1, 5, 2, 6, 3, 7, 4).reshape(B, t * pt, h * p, w * p, C)
    np.testing.assert_allclose(out, want, atol=2e-4)


def test_f32_ignores_fast_flag():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 5, 32, 32, 3) * 0.3, jnp.float32)
    cfg_on = SMALL.replace(fast_patchify=True)
    cfg_off = SMALL.replace(fast_patchify=False)
    n1, n2 = OmniTokenizerNet(cfg_on), OmniTokenizerNet(cfg_off)
    v = n2.init(jax.random.PRNGKey(0), x, False)
    r1, _ = n1.apply(v, x, False)
    r2, _ = n2.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
