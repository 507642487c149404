"""Numerical parity vs independent torch oracles built from the reference
semantics (torch functional ops only — SDPA, layer_norm, complex rotary).

These cover the hard-parity pieces from SURVEY §7.3: cosine-sim attention
with the pre-norm-kv quirk and scale=8, RoPE-2D frequency layout, window
attention with relative-position bias, and the GPT block."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from omnitokenizer_tpu.ops.attention import Attention
from omnitokenizer_tpu.ops.window import WindowAttention, relative_position_index

RNG = np.random.RandomState(42)


def _np(x):
    return np.asarray(x)


def torch_cosine_attention(x, p, heads, dim_head, spatial_pos, is_spatial,
                           causal=False, scale=8.0):
    """Oracle for reference attention.py:395-486 (SDPA path semantics)."""
    xt = torch.from_numpy(x)
    kv_input = xt  # pre-norm quirk (:404-412)
    gamma = torch.from_numpy(_np(p["norm_gamma"]))
    xn = TF.layer_norm(xt, xt.shape[-1:], gamma, torch.zeros_like(gamma))
    q = xn @ torch.from_numpy(_np(p["to_q_kernel"]))
    kvt = kv_input @ torch.from_numpy(_np(p["to_kv_kernel"]))
    k, v = kvt.chunk(2, dim=-1)
    B, N, _ = x.shape
    q = q.view(B, N, heads, dim_head)
    k = k.view(B, N, heads, dim_head)
    v = v.view(B, N, heads, dim_head)

    if spatial_pos == "rope" and is_spatial:
        # reference attention.py:28-70 complex rotary
        H = int(N ** 0.5)
        pos = torch.arange(N)
        xp, yp = pos % H, pos // H
        freqs = 1.0 / (10000.0 ** (torch.arange(0, dim_head, 4)[: dim_head // 4].float() / dim_head))
        x_cis = torch.polar(torch.ones(N, dim_head // 4), torch.outer(xp, freqs))
        y_cis = torch.polar(torch.ones(N, dim_head // 4), torch.outer(yp, freqs))
        cis = torch.cat([x_cis.unsqueeze(-1), y_cis.unsqueeze(-1)], dim=-1).reshape(N, -1)

        def rot(t):
            tc = torch.view_as_complex(t.float().reshape(*t.shape[:-1], -1, 2))
            return torch.view_as_real(tc * cis.view(1, N, 1, -1)).flatten(3)

        q, k = rot(q), rot(k)

    q = TF.normalize(q, dim=-1) * torch.from_numpy(_np(p["q_scale"]))
    k = TF.normalize(k, dim=-1) * torch.from_numpy(_np(p["k_scale"]))
    q = q.permute(0, 2, 1, 3)
    k = k.permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3)
    out = TF.scaled_dot_product_attention(q, k, v, is_causal=causal, scale=scale)
    out = out.permute(0, 2, 1, 3).reshape(B, N, heads * dim_head)
    return (out @ torch.from_numpy(_np(p["to_out_kernel"]))).numpy()


def test_attention_parity_rel_temporal_causal():
    """Causal temporal attention ('rel' + sdpa mode = no bias applied)."""
    attn = Attention(dim=32, dim_head=8, heads=4, causal=True,
                     spatial_pos="rel", attn_bias_mode="sdpa")
    x = RNG.randn(3, 7, 32).astype(np.float32) * 0.7
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), is_spatial=False)
    got = _np(attn.apply(variables, jnp.asarray(x), is_spatial=False))
    want = torch_cosine_attention(x, variables["params"], 4, 8, "rel", False,
                                  causal=True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_attention_parity_rope_spatial():
    """Spatial attention with 2D rotary (the flagship stage-2 config)."""
    attn = Attention(dim=32, dim_head=8, heads=4, causal=False,
                     spatial_pos="rope", attn_bias_mode="sdpa")
    x = RNG.randn(2, 16, 32).astype(np.float32) * 0.7  # 4x4 grid
    variables = attn.init(jax.random.PRNGKey(1), jnp.asarray(x), is_spatial=True)
    got = _np(attn.apply(variables, jnp.asarray(x), is_spatial=True))
    want = torch_cosine_attention(x, variables["params"], 4, 8, "rope", True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_window_attention_parity():
    """Swin W-MSA with relative-position bias vs a torch oracle
    (reference attention.py:202-293)."""
    ws, heads, dim = 2, 2, 8
    wa = WindowAttention(dim=dim, window_size=ws, num_heads=heads)
    x = RNG.randn(2, 16, dim).astype(np.float32)
    variables = wa.init(jax.random.PRNGKey(2), jnp.asarray(x))
    p = variables["params"]
    got = _np(wa.apply(variables, jnp.asarray(x)))

    # torch oracle
    xt = torch.from_numpy(x)
    gamma = torch.from_numpy(_np(p["norm"]["gamma"]))
    xn = TF.layer_norm(xt, (dim,), gamma, torch.zeros_like(gamma))
    B, N, C = x.shape
    H = W = 4
    g = xn.view(B, H, W, C)
    wins = (g.view(B, H // ws, ws, W // ws, ws, C)
             .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C))
    qkv = wins @ torch.from_numpy(_np(p["qkv"]["kernel"]))
    BW, NW, _ = qkv.shape
    qkv = qkv.reshape(BW, NW, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // heads) ** -0.5
    att = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(ws).reshape(-1).astype(np.int64))
    table = torch.from_numpy(_np(p["relative_position_bias_table"]))
    bias = table[idx].view(NW, NW, heads).permute(2, 0, 1)
    att = torch.softmax(att + bias.unsqueeze(0), dim=-1)
    out = (att @ v).transpose(1, 2).reshape(BW, NW, C)
    out = out @ torch.from_numpy(_np(p["proj"]["kernel"])) + torch.from_numpy(_np(p["proj"]["bias"]))
    out = (out.view(B, H // ws, W // ws, ws, ws, C)
              .permute(0, 1, 3, 2, 4, 5).reshape(B, N, C))
    np.testing.assert_allclose(got, out.numpy(), rtol=1e-3, atol=1e-4)


def _torch_gpt_forward(p, cfg, idx, pe_idx):
    """Full torch GPT forward with EXPLICIT position-embedding indices —
    reproduces the reference's incremental decode math (gpt.py:236-275):
    causal attention over the dense token sequence, pe rows `pe_idx`."""
    tok_emb = torch.from_numpy(_np(p["tok_emb"]["embedding"]))
    pos_emb = torch.from_numpy(_np(p["pos_emb"]))[0]
    x = tok_emb[torch.from_numpy(idx)] + pos_emb[torch.from_numpy(pe_idx)]

    def lin(bp, name, t):
        return t @ torch.from_numpy(_np(bp[name]["kernel"])) + \
            torch.from_numpy(_np(bp[name]["bias"]))

    B, T, C = x.shape
    H = cfg.n_head
    for i in range(cfg.n_layer):
        bp = p[f"block{i}"]
        h = TF.layer_norm(x, (C,), torch.from_numpy(_np(bp["ln1"]["scale"])),
                          torch.from_numpy(_np(bp["ln1"]["bias"])))
        q = lin(bp, "query", h).view(B, T, H, C // H).transpose(1, 2)
        k = lin(bp, "key", h).view(B, T, H, C // H).transpose(1, 2)
        v = lin(bp, "value", h).view(B, T, H, C // H).transpose(1, 2)
        y = TF.scaled_dot_product_attention(q, k, v, is_causal=True)
        y = y.transpose(1, 2).reshape(B, T, C)
        x = x + lin(bp, "proj", y)
        h = TF.layer_norm(x, (C,), torch.from_numpy(_np(bp["ln2"]["scale"])),
                          torch.from_numpy(_np(bp["ln2"]["bias"])))
        h = TF.gelu(lin(bp, "fc", h))
        x = x + lin(bp, "proj_out", h)
    x = TF.layer_norm(x, (C,), torch.from_numpy(_np(p["ln_f"]["scale"])),
                      torch.from_numpy(_np(p["ln_f"]["bias"])))
    return (x @ torch.from_numpy(_np(p["head"]["kernel"]))).numpy()


def test_cfg_sampling_parity_vs_reference_algorithm():
    """Greedy CFG generation vs the reference sample_with_past_cfg algorithm
    (gpt.py:387-444): cond stream [sos, c, x...] with dense pe; uncond
    stream [sos, x...] with pe indices [0, 2, 3, ...] (forward_uncond's +1
    offset, gpt.py:251); blend (1+t)*cond - t*uncond each step."""
    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT, make_cfg_sampler

    cfg = GPTConfig(vocab_size=40, block_size=24, n_layer=2, n_head=2, n_embd=16)
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(5),
                      jnp.zeros((1, 4), jnp.int32))["params"]
    steps, t = 6, 1.5
    cls = np.asarray([[3], [11]], np.int64)

    # torch reference loop (full recompute each step == growing KV cache)
    seq_c = np.concatenate([np.zeros_like(cls), cls + 1], axis=1)  # [sos, c]
    seq_u = np.zeros_like(cls)                                     # [sos]
    toks = []
    for n in range(steps):
        pe_c = np.arange(seq_c.shape[1])
        pe_u = np.concatenate([[0], np.arange(2, seq_u.shape[1] + 1)])
        lc = _torch_gpt_forward(params, cfg, seq_c, pe_c)[:, -1]
        lu = _torch_gpt_forward(params, cfg, seq_u, pe_u)[:, -1]
        tok = np.argmax((1 + t) * lc - t * lu, axis=-1)[:, None]
        toks.append(tok)
        seq_c = np.concatenate([seq_c, tok], axis=1)
        seq_u = np.concatenate([seq_u, tok], axis=1)
    want = np.concatenate(toks, axis=1)

    sample = make_cfg_sampler(cfg, steps=steps, cfg_ratio=t, greedy=True)
    got = np.asarray(sample(params, jnp.asarray(cls, jnp.int32),
                            jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(got, want)


def test_gpt_block_parity():
    """GPT causal self-attention block vs torch (reference gpt.py:74-167)."""
    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import TransformerBlock

    cfg = GPTConfig(vocab_size=10, block_size=16, n_layer=1, n_head=2, n_embd=16)
    blk = TransformerBlock(cfg)
    x = RNG.randn(2, 8, 16).astype(np.float32) * 0.5
    variables = blk.init(jax.random.PRNGKey(3), jnp.asarray(x))
    p = variables["params"]
    got, _ = blk.apply(variables, jnp.asarray(x))

    xt = torch.from_numpy(x)
    def lin(name, t):
        return t @ torch.from_numpy(_np(p[name]["kernel"])) + torch.from_numpy(_np(p[name]["bias"]))

    h = TF.layer_norm(xt, (16,), torch.from_numpy(_np(p["ln1"]["scale"])),
                      torch.from_numpy(_np(p["ln1"]["bias"])))
    q = lin("query", h).view(2, 8, 2, 8).transpose(1, 2)
    k = lin("key", h).view(2, 8, 2, 8).transpose(1, 2)
    v = lin("value", h).view(2, 8, 2, 8).transpose(1, 2)
    y = TF.scaled_dot_product_attention(q, k, v, is_causal=True)
    y = y.transpose(1, 2).reshape(2, 8, 16)
    xt = xt + lin("proj", y)
    h = TF.layer_norm(xt, (16,), torch.from_numpy(_np(p["ln2"]["scale"])),
                      torch.from_numpy(_np(p["ln2"]["bias"])))
    h = TF.gelu(lin("fc", h))
    want = (xt + lin("proj_out", h)).numpy()
    np.testing.assert_allclose(_np(got), want, rtol=1e-3, atol=1e-4)
