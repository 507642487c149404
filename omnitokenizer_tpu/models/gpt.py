"""minGPT-style autoregressive transformer + compiled KV-cache sampling.

Reference: /root/reference/OmniTokenizer/modules/gpt.py — GPTConfig :54,
CausalSelfAttention :74 (SDPA :122-125), Block :143, GPT :170,
forward_with_past KV cache :236-274, samplers :327-444 (incl. CFG dual-cache
logit blend (1+t)*logits - t*logits_uncond :427) and
top_k_top_p_filtering :19-51.

TPU-native design: sampling is a single `lax.scan` over decode steps with a
static-shape KV cache carried as per-layer (k, v) leaves of
(B, heads, block_size, head_dim) — separate leaves so XLA aliases the
while-loop buffers and updates them in place (see init_cache)
and `dynamic_update_slice` writes — one compiled graph instead of the
reference's 5120-iteration eager Python loop.  Position masking uses iota
comparisons, never dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import GPTConfig
from ..ops.precision import mm_precision

NEG_INF = -1e9


def _flash_ok(cfg: GPTConfig, seq_len: int, dtype) -> bool:
    """Gate for the streaming flash-attention kernel in the full (training /
    teacher-forcing) forward: TPU backend, bf16 compute, and a sequence long
    enough to tile (T pads to the 128 block grid; short prefills and the
    f32 oracle-parity path keep the materialized XLA math)."""
    return (cfg.flash_attention and dtype == jnp.bfloat16
            and seq_len >= 256 and jax.default_backend() == "tpu")


class TransformerBlock(nn.Module):
    cfg: GPTConfig

    @nn.compact
    def __call__(self, x, cache=None, pos=None, slot=None, key_mask=None,
                 kv_window=None):
        """x: (B, T, C).  With cache=(k_cache, v_cache) of static length
        `block_size` and scalar `pos`, performs incremental decode and
        returns updated (k_cache, v_cache).

        `slot` is the scalar cache position to write at; it defaults to
        `pos` (the position-embedding index) but may differ — the
        reference's CFG uncond stream keeps a DENSE kv sequence whose pe
        indices are offset by +1 (gpt.py:251 `forward_uncond`).

        `key_mask` (B, block) bool marks per-row attendable cache slots
        (True = visible), ANDed with the causal mask.  This lets the fused
        [cond|uncond] 2B cache hide a never-written slot for the uncond
        rows with ONE shared dynamic_update_slice — a per-row write depth
        would lower to a scatter that rewrites the whole multi-GB cache
        every decode step.

        `kv_window` (static int) restricts attention to cache slots
        [0, kv_window) — the caller guarantees slot+T <= kv_window.  Long
        AR generation (5120-token video) is bound by the per-step cache
        sweep; bucketed windows cut it to the written prefix."""
        cfg = self.cfg
        C = cfg.n_embd
        H = cfg.n_head
        hd = C // H
        B, T, _ = x.shape
        prec = mm_precision(cfg.dtype)

        def dense(name, inp, feat):
            """Dense or, in int8 serving mode, a W8A8 matmul reading the
            "quant" collection (ops/int8.py) — f32 master params untouched."""
            if cfg.int8_decode and self.has_variable("quant", name):
                from ..ops.int8 import int8_matmul

                qv = self.get_variable("quant", name)
                return (int8_matmul(inp, qv["q"], qv["s"])
                        + qv["b"]).astype(cfg.dtype)
            return nn.Dense(feat, dtype=cfg.dtype, precision=prec, name=name)(inp)

        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln1")(x)
        q = dense("query", h, C)
        k = dense("key", h, C)
        v = dense("value", h, C)

        def split(t):
            if T == 1:
                # (B,1,H,hd) -> (B,H,1,hd) preserves linear order: a free
                # reshape instead of a transpose op in the decode loop
                return t.reshape(B, H, 1, hd)
            return jnp.transpose(t.reshape(B, T, H, hd), (0, 2, 1, 3))  # (B,H,T,hd)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / float(np.sqrt(hd))

        if cache is None:
            if _flash_ok(cfg, T, q.dtype):
                # streaming kernel: O(T) memory fwd+bwd instead of the
                # (B,H,T,T) f32 score tensor (512 MB at B=8/T=1024 — the
                # materialized path OOMs flagship LM training on 16 GB).
                # T pads to the 128 block grid; tail keys sit ABOVE every
                # real query's diagonal so causal masking excludes them,
                # and the garbage tail query rows are sliced off.  Block
                # size dominates kernel throughput — the library default
                # 128 is 2.2-2.4x off the largest tile that divides the
                # padded length (on-chip: 12.3 -> 5.1 ms fwd+bwd at
                # T=1024/block 512; 14.7 -> 6.8 ms at T=1152/block 384).
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    BlockSizes, flash_attention)

                Tp = -(-T // 128) * 128
                blk = next(b for b in (512, 384, 256, 128) if Tp % b == 0)
                bs = BlockSizes(
                    block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                    block_q_major_dkv=blk, block_k_major_dkv=blk,
                    block_k_dkv=blk, block_q_dkv=blk,
                    block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
                qp, kp, vp = (
                    (jnp.pad(t, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
                     if Tp != T else t)
                    for t in (q, k, v.astype(q.dtype)))
                y = flash_attention(qp, kp, vp, causal=True, sm_scale=scale,
                                    block_sizes=bs)
                if Tp != T:
                    y = y[:, :, :T]
            else:
                sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=prec,
                                 preferred_element_type=jnp.float32) * scale
                row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
                sim = jnp.where(col > row, NEG_INF, sim)
                attn = jax.nn.softmax(sim, axis=-1).astype(cfg.dtype)
                y = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=prec)
            new_cache = None
        else:
            k_cache, v_cache = cache  # (B, H, block, hd)
            slot = pos if slot is None else slot
            k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, 0, slot, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, 0, slot, 0))
            # read window: only the written prefix when the caller bounds it
            kw = k_cache if kv_window is None else k_cache[:, :, :kv_window]
            vw = v_cache if kv_window is None else v_cache[:, :, :kv_window]
            sim = jnp.einsum("bhid,bhjd->bhij", q, kw, precision=prec,
                             preferred_element_type=jnp.float32) * scale
            # query i (at cache depth slot+i) may attend keys j <= slot+i
            i = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 2)
            j = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 3)
            sim = jnp.where(j > slot + i, NEG_INF, sim)
            if key_mask is not None:
                km = key_mask if kv_window is None else key_mask[:, :kv_window]
                sim = jnp.where(km[:, None, None, :], sim, NEG_INF)
            attn = jax.nn.softmax(sim, axis=-1).astype(cfg.dtype)
            y = jnp.einsum("bhij,bhjd->bhid", attn, vw, precision=prec)
            new_cache = (k_cache, v_cache)

        if T == 1:
            y = y.reshape(B, 1, C)  # linear-order preserving, no transpose
        else:
            y = jnp.transpose(y, (0, 2, 1, 3)).reshape(B, T, C)
        x = x + dense("proj", y, C)

        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln2")(x)
        h = dense("fc", h, 4 * C)
        h = jax.nn.gelu(h, approximate=False)
        x = x + dense("proj_out", h, C)
        return x, new_cache


class GPT(nn.Module):
    cfg: GPTConfig
    # vtokens_pos: learned (seq_len, res, res, n_embd) table added to the
    # flat positional embedding through per-sample crop boxes
    # (reference gpt.py:182-184, 218-223); crop size is static
    vtokens_seq_len: int = 0
    vtokens_res: int = 0
    vtokens_crop: int = 0

    @nn.compact
    def __call__(self, idx: jnp.ndarray, cache=None, pos=None, cbox=None,
                 slot=None, key_mask=None, kv_window=None,
                 ) -> Tuple[jnp.ndarray, Any]:
        """idx: (B, T) int tokens.  Full forward when cache is None; one-step
        incremental decode (T==1, scalar pos) otherwise.  `cbox` (B, 4) are
        [y0, y1, x0, x1] crop boxes into the vtokens positional table.
        `slot` (scalar) decouples the cache write depth from the pe index
        `pos`; `key_mask` (B, block) marks per-row attendable cache slots
        (see TransformerBlock)."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.n_embd, dtype=cfg.dtype, name="tok_emb")(idx)
        pos_emb = self.param("pos_emb", nn.initializers.zeros,
                             (1, cfg.block_size, cfg.n_embd), jnp.float32)
        T = idx.shape[1]
        if cache is None:
            x = tok + pos_emb[:, :T].astype(cfg.dtype)
        else:
            pe = jax.lax.dynamic_slice(pos_emb, (0, pos, 0), (1, T, cfg.n_embd))
            x = tok + pe.astype(cfg.dtype)

        if cfg.vtokens_pos and cbox is not None:
            vt = self.param(
                "vtokens_pos_emb", nn.initializers.zeros,
                (self.vtokens_seq_len, self.vtokens_res, self.vtokens_res,
                 cfg.n_embd), jnp.float32)
            crop = self.vtokens_crop or self.vtokens_res

            def gather(box):
                return jax.lax.dynamic_slice(
                    vt, (0, box[0], box[2], 0),
                    (self.vtokens_seq_len, crop, crop, cfg.n_embd))

            # flatten crops to (B, seq*crop*crop, C) and add the window that
            # matches the current positions
            crops = jax.vmap(gather)(cbox)
            flat = crops.reshape(cbox.shape[0], -1, cfg.n_embd)
            if cache is None:
                x = x + flat[:, :T].astype(cfg.dtype)
            else:
                pe2 = jax.lax.dynamic_slice_in_dim(flat, pos, T, axis=1)
                x = x + pe2.astype(cfg.dtype)

        new_caches = []
        for i in range(cfg.n_layer):
            layer_cache = None if cache is None else cache[i]
            x, lc = TransformerBlock(cfg, name=f"block{i}")(x, layer_cache, pos,
                                                            slot=slot,
                                                            key_mask=key_mask,
                                                            kv_window=kv_window)
            if lc is not None:
                new_caches.append(lc)

        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_f")(x)
        if cfg.int8_decode and self.has_variable("quant", "head"):
            from ..ops.int8 import int8_matmul

            qv = self.get_variable("quant", "head")
            logits = int8_matmul(x, qv["q"], qv["s"])
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                              precision=mm_precision(cfg.dtype), name="head")(x)
        if cache is None:
            return logits.astype(jnp.float32), None
        return logits.astype(jnp.float32), tuple(new_caches)


def init_cache(cfg: GPTConfig, batch: int) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
    """Per-layer ((k, v), ...) leaves, each (B, H, block, hd).

    Deliberately NOT one stacked (L, ...) array: separate carry leaves let
    XLA's while-loop buffer aliasing update each layer's cache IN PLACE.
    The stacked layout forced a slice + dynamic-update-slice + restack per
    layer per decode step — a full copy of the multi-GB cache every token
    (trace: 9.4 of 16 ms/step for the 24L/1536 LM at batch 8)."""
    hd = cfg.n_embd // cfg.n_head
    shape = (batch, cfg.n_head, cfg.block_size, hd)
    return tuple((jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
                 for _ in range(cfg.n_layer))


# --------------------------------------------------------------------------
# logit filtering + sampling (gpt.py:19-51)
# --------------------------------------------------------------------------

def top_k_top_p_filtering(logits: jnp.ndarray, top_k: int = 0, top_p: float = 1.0,
                          ) -> jnp.ndarray:
    """(B, V) logits -> filtered logits with -inf outside the nucleus."""
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove = cum > top_p
        # keep the first token above threshold (shift right by one)
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        sorted_logits = jnp.where(remove, NEG_INF, sorted_logits)
        inv = jnp.argsort(sort_idx, axis=-1)
        logits = jnp.take_along_axis(sorted_logits, inv, axis=-1)
    return logits


def _sample_token(key, logits, temperature, top_k, top_p, greedy=False):
    logits = logits / temperature
    if top_k or top_p < 1.0:
        logits = top_k_top_p_filtering(logits, top_k=top_k or 0, top_p=top_p)
    if greedy:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(key, logits, axis=-1)


# --------------------------------------------------------------------------
# compiled samplers
# --------------------------------------------------------------------------

def _cast_params_once(params, cfg: GPTConfig):
    """Pre-cast f32 params to the compute dtype BEFORE the decode loop
    (ops/precision.cast_f32_leaves; shared with the tokenizer wrapper)."""
    from ..ops.precision import cast_f32_leaves

    return cast_f32_leaves(params, cfg.dtype)


def _decode_segments(first_pos: int, n_iters: int, block_size: int,
                     bucket: Optional[int]):
    """Split `n_iters` decode iterations (cache writes at first_pos + i)
    into segments with a static attention window: segment iterations
    [off, off+n) attend only cache[:, :, :win).  One compiled scan body per
    distinct window — long generation then pays for the written prefix
    instead of the full block every step (the cache sweep dominates
    5120-token video generation)."""
    if not bucket or n_iters <= 0:
        return [(0, n_iters, None)]
    segs = []
    off = 0
    while off < n_iters:
        n = min(bucket, n_iters - off)
        # round the window up to a lane-friendly multiple of 256; even a
        # single segment bounds the sweep to the written prefix instead of
        # the full block (block 1025 vs 130 written for a 128-step run)
        win = min(block_size, -(-(first_pos + off + n) // 256) * 256)
        segs.append((off, n, win))
        off += n
    return segs


def _run_segments(segs, body_for_win, carry):
    toks_parts = []
    for off, n, win in segs:
        carry, toks = jax.lax.scan(body_for_win(win), carry,
                                   jnp.arange(off, off + n))
        toks_parts.append(toks)
    toks = (toks_parts[0] if len(toks_parts) == 1
            else jnp.concatenate(toks_parts, axis=0))
    return carry, toks


def _constrain_caches(caches, cache_sharding):
    """Tensor-parallel decode: pin each (B, H, block, hd) cache leaf to
    `cache_sharding` (e.g. NamedSharding(mesh, P(None, 'model'))) so the KV
    sweep shards over heads alongside Megatron-sharded params — GSPMD keeps
    the per-step attention local to each device and only the logits
    reduction crosses the mesh (beyond-reference; the video-scale
    5120-token decode is cache-sweep-bound, PERF.md)."""
    if cache_sharding is None:
        return caches
    return jax.tree_util.tree_map(
        lambda c: jax.lax.with_sharding_constraint(c, cache_sharding), caches)


def make_sampler(cfg: GPTConfig, steps: int, temperature: float = 1.0,
                 top_k: Optional[int] = None, top_p: float = 1.0,
                 greedy: bool = False, bucket: Optional[int] = None,
                 cache_sharding=None):
    """Compiled analogue of sample_with_past (gpt.py:327-358).

    Returns sample(params, cond, key) -> (B, steps) tokens, where `cond`
    (B, L_cond) is the conditioning prefix.  `bucket` enables segmented
    attention windows for long generations (see _decode_segments).
    """
    gpt = GPT(cfg)

    @jax.jit
    def sample(params, cond, key, quant=None):
        params = _cast_params_once(params, cfg)
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        B, L = cond.shape
        # cache writes land at slots [0, L + steps - 1); a too-small block
        # would make dynamic_update_slice clamp and silently corrupt decode
        assert L + steps - 1 <= cfg.block_size, (
            f"prefix {L} + steps {steps} exceeds block_size {cfg.block_size}")
        caches = _constrain_caches(init_cache(cfg, B), cache_sharding)

        # prefill: run the whole prefix at once, writing the cache
        logits, caches = gpt.apply(variables, cond, caches, 0)
        key, sub = jax.random.split(key)
        tok = _sample_token(sub, logits[:, -1], temperature, top_k, top_p, greedy)

        def body_for_win(win):
            def body(carry, i):
                caches, tok, key = carry
                key, sub = jax.random.split(key)
                logits, caches = gpt.apply(
                    variables, tok[:, None], caches, L + i,
                    kv_window=win)
                nxt = _sample_token(sub, logits[:, -1], temperature, top_k,
                                    top_p, greedy)
                return (caches, nxt, key), tok
            return body

        segs = _decode_segments(L, steps - 1, cfg.block_size, bucket)
        (_, last, _), toks = _run_segments(segs, body_for_win,
                                           (caches, tok, key))
        toks = jnp.concatenate([jnp.transpose(toks, (1, 0)), last[:, None]], axis=1)
        return toks

    return sample


def make_cfg_sampler(cfg: GPTConfig, steps: int, temperature: float = 1.0,
                     top_k: Optional[int] = None, top_p: float = 1.0,
                     cfg_ratio: float = 1.5, class_first: bool = False,
                     scale_cfg: bool = False, greedy: bool = False,
                     bucket: Optional[int] = None, cache_sharding=None):
    """Compiled analogue of sample_with_past_cfg (gpt.py:387-444): dual
    cond/uncond KV caches, blended logits (1+t)*cond - t*uncond.

    sample(params, cls, key) -> (B, steps); `cls` (B, 1) raw class ids (the
    +1 shift and sos prepend happen inside, matching gpt.py:390-397).
    """
    gpt = GPT(cfg)

    @jax.jit
    def sample(params, cls, key, quant=None):
        params = _cast_params_once(params, cfg)
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        B = cls.shape[0]
        c = cls + 1
        sos = jnp.zeros_like(c)
        prefix = jnp.concatenate([c, sos] if class_first else [sos, c], axis=1)
        L = prefix.shape[1]  # 2
        assert L + steps - 1 <= cfg.block_size, (
            f"prefix {L} + steps {steps} exceeds block_size {cfg.block_size}")

        caches_c = _constrain_caches(init_cache(cfg, B), cache_sharding)
        caches_u = _constrain_caches(init_cache(cfg, B), cache_sharding)

        logits_c, caches_c = gpt.apply(variables, prefix, caches_c, 0)
        # uncond stream sees only sos at pe index 0 / cache slot 0; its
        # generated tokens stay DENSE in the cache (slot 1+i) while sharing
        # the cond stream's pe indices (2+i) — exactly the reference's
        # `forward_uncond` +1 pe offset over a gapless past (gpt.py:251,410)
        logits_u, caches_u = gpt.apply(variables, sos, caches_u, 0)
        # The two CFG streams ride ONE cache of batch 2B ([cond | uncond]):
        # incremental decode is weight-bandwidth-bound on TPU, so one fused
        # 2B step halves the per-token weight reads vs the reference's two
        # sequential forwards (gpt.py:418-426).
        caches = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), caches_c, caches_u)

        def blend(lc, lu, i):
            ratio = jnp.where(scale_cfg, i.astype(jnp.float32), 1.0)
            t = cfg_ratio * ratio
            return (1.0 + t) * (lc / temperature) - t * (lu / temperature)

        key, sub = jax.random.split(key)
        first = _sample_token(
            sub, blend(logits_c[:, -1], logits_u[:, -1], jnp.asarray(0)),
            1.0, top_k, top_p, greedy)

        # uncond rows never write cache slot 1 (their past is [sos at 0,
        # tokens at 2..]); mask that slot out for them — same key SET as the
        # reference's dense uncond past, placement-invariant under softmax
        jcol = jnp.arange(cfg.block_size)
        row_mask = jnp.concatenate([
            jnp.ones((B, cfg.block_size), bool),
            jnp.broadcast_to(jcol != 1, (B, cfg.block_size))])

        def body_for_win(win):
            def body(carry, i):
                caches, tok, key = carry
                key, sub = jax.random.split(key)
                tok2 = jnp.concatenate([tok, tok], axis=0)
                # one shared write depth + pe index L+i for all 2B rows
                logits, caches = gpt.apply(variables, tok2[:, None],
                                           caches, L + i, key_mask=row_mask,
                                           kv_window=win)
                nxt = _sample_token(sub, blend(logits[:B, -1], logits[B:, -1],
                                               i + 1), 1.0, top_k, top_p, greedy)
                return (caches, nxt, key), tok
            return body

        segs = _decode_segments(L, steps - 1, cfg.block_size, bucket)
        (_, last, _), toks = _run_segments(segs, body_for_win,
                                           (caches, first, key))
        toks = jnp.concatenate([jnp.transpose(toks, (1, 0)), last[:, None]], axis=1)
        return toks

    return sample


def make_hardcfg_sampler(cfg: GPTConfig, steps: int, temperature: float = 1.0,
                         top_k: Optional[int] = None, top_p: float = 1.0,
                         cfg_ratio: float = 1.5, class_first: bool = False,
                         greedy: bool = False, bucket: Optional[int] = None):
    """Compiled analogue of sample_with_past_hardcfg (gpt.py:448-486).

    Differs from sample_with_past_cfg in two ways the reference encodes:
    (1) the uncond stream re-reads [sos, x_0..x_{n-1}] with its OWN dense
    positions 0..n (the cfg variant offsets uncond pe by +1 to share the
    cond indices, gpt.py:251), and (2) the guidance scale always grows
    linearly with the step, t = cfg_ratio * n.  The reference re-runs both
    full forwards every step; here both streams decode incrementally from
    separate KV caches — identical math, O(steps) instead of O(steps^2).
    """
    gpt = GPT(cfg)

    @jax.jit
    def sample(params, cls, key, quant=None):
        params = _cast_params_once(params, cfg)
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        B = cls.shape[0]
        c = cls + 1
        sos = jnp.zeros_like(c)
        prefix = jnp.concatenate([c, sos] if class_first else [sos, c], axis=1)
        L = prefix.shape[1]
        assert L + steps - 1 <= cfg.block_size, (
            f"prefix {L} + steps {steps} exceeds block_size {cfg.block_size}")

        caches_c = init_cache(cfg, B)
        caches_u = init_cache(cfg, B)
        logits_c, caches_c = gpt.apply(variables, prefix, caches_c, 0)
        logits_u, caches_u = gpt.apply(variables, sos, caches_u, 0)

        def blend(lc, lu, n):
            t = cfg_ratio * n.astype(jnp.float32)
            return (1.0 + t) * (lc / temperature) - t * (lu / temperature)

        key, sub = jax.random.split(key)
        first = _sample_token(
            sub, blend(logits_c[:, -1], logits_u[:, -1], jnp.asarray(0)),
            1.0, top_k, top_p, greedy)

        def body_for_win(win):
            def body(carry, i):
                cc, cu, tok, key = carry
                key, sub = jax.random.split(key)
                lc, cc = gpt.apply(variables, tok[:, None], cc, L + i,
                                   kv_window=win)
                lu, cu = gpt.apply(variables, tok[:, None], cu, 1 + i,
                                   kv_window=win)
                nxt = _sample_token(sub, blend(lc[:, -1], lu[:, -1], i + 1),
                                    1.0, top_k, top_p, greedy)
                return (cc, cu, nxt, key), tok
            return body

        segs = _decode_segments(L, steps - 1, cfg.block_size, bucket)
        (_, _, last, _), toks = _run_segments(segs, body_for_win,
                                              (caches_c, caches_u, first, key))
        toks = jnp.concatenate([jnp.transpose(toks, (1, 0)), last[:, None]], axis=1)
        return toks

    return sample
