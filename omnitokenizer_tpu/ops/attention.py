"""Core attention ops: cosine-similarity attention (the reference's main
attention, /root/reference/OmniTokenizer/modules/attention.py:342-486), the
GEGLU feed-forward (:153-168), and token-grid Pooling/Up blocks (:83-150).

TPU-first notes:
 * the softmax core is a single fused dot-softmax-dot in f32 accumulators —
   XLA maps both contractions onto the MXU; sequence lengths here (<=1024
   spatial, <=5 temporal) fit VMEM so no streaming kernel is needed;
 * all biases/masks are precomputed static tables (no dynamic shapes);
 * `attn_bias_mode='sdpa'` reproduces the reference's released-checkpoint
   behaviour where rel-bias/AliBi are computed but dropped on the torch SDPA
   fast path (attention.py:439-451).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bias import ContinuousPositionBias, alibi_bias
from .norms import LayerNorm, LayerNormGamma
from .precision import mm_precision
from .rotary import apply_rotary_emb_2d

NEG_INF = -1e9


def l2norm(t: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps).

    sqrt(max(sumsq, eps^2)) == max(||x||, eps) forward, but routes the sqrt
    backward to the constant branch at zero vectors, giving torch's zero
    gradient there — jnp.linalg.norm's vjp is 0/0 = NaN at ||x|| = 0, and
    zero vectors DO occur: constant pixel patches pass through the
    patch-embed LayerNorm as exactly 0, and k/v read that pre-norm input
    (reference quirk, attention.py:404-412)."""
    sq = jnp.sum(t * t, axis=axis, keepdims=True)
    return t / jnp.sqrt(jnp.maximum(sq, eps * eps))
    n = jnp.linalg.norm(t, axis=axis, keepdims=True)
    return t / jnp.maximum(n, eps)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    causal: bool = False,
    training: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v over (B, H, N, D) tensors.

    Logits and softmax always accumulate in f32 (preferred_element_type);
    the matmul multiply precision follows the input dtype — bf16 inputs ride
    the native MXU bf16 path, f32 inputs pin HIGHEST for parity.

    On TPU, bias-free attention routes through the fused Pallas kernel
    (ops/pallas/mha.py), which keeps the (N, N) scores in VMEM.
    """
    from .pallas.mha import mha_pallas, mha_supported

    # the kernel has no linearization rule: training (jax.grad) takes the
    # XLA math below, which differentiates cleanly
    if not training and mha_supported(q, bias, causal):
        return mha_pallas(q, k, v, scale, causal)

    # NOTE (round-5 on-chip A/B, PERF.md): routing this TRAINING path
    # through the streaming flash kernel LOSES on the tokenizer GAN step —
    # 181.8 -> 158.2 f/s at B=2, 184.5 -> 153.8 at B=4 — because dim_head
    # 64 fills only half the kernel's 128-lane tiles while XLA's
    # materialized math fuses into the neighbouring projections.  The LM
    # keeps flash (models/gpt.py): at T=1024 the f32 scores OOM, and its
    # dim_head 96 wastes less of the tile.

    fast = q.dtype == jnp.bfloat16
    prec = None if fast else jax.lax.Precision.HIGHEST
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=prec,
                     preferred_element_type=jnp.float32) * scale
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)
    if causal:
        i, j = sim.shape[-2], sim.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (i, j), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (i, j), 1)
        causal_mask = col > (row + (j - i))
        sim = jnp.where(causal_mask, NEG_INF, sim)
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(q.dtype), precision=prec,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _attention_ref_math(x, gamma, wq, wkv, q_scale, k_scale, *, dtype, heads,
                        dim_head, scale, causal, use_rope):
    """Plain-XLA cosine attention (bias-free) as a pure function of
    (x (B, N, D), params) -> (B, N, H*D) pre-output-projection tokens.

    Op-for-op the same math as the in-method path of `Attention.__call__`
    below (incl. the k/v-reads-pre-norm reference quirk) — it defines the
    BACKWARD of the kernel-forward training branch (ops/kernel_grad.py), so
    any drift between the two is a training/serving numerics split."""
    from .norms import _layer_norm

    B, N, _ = x.shape
    inner = heads * dim_head
    prec = mm_precision(dtype)
    xn = (_layer_norm(x) * gamma).astype(dtype)
    q = jnp.dot(xn, wq.astype(dtype), precision=prec,
                preferred_element_type=jnp.float32).astype(dtype)
    kv = jnp.dot(x.astype(dtype), wkv.astype(dtype), precision=prec,
                 preferred_element_type=jnp.float32).astype(dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(B, N, heads, dim_head)
    k = k.reshape(B, N, heads, dim_head)
    v = v.reshape(B, N, heads, dim_head)
    if use_rope:
        q, k = apply_rotary_emb_2d(q, k)
    q = l2norm(q.astype(jnp.float32)) * q_scale
    k = l2norm(k.astype(jnp.float32)) * k_scale
    q = jnp.transpose(q, (0, 2, 1, 3)).astype(dtype)
    k = jnp.transpose(k, (0, 2, 1, 3)).astype(dtype)
    v = jnp.transpose(v, (0, 2, 1, 3))
    out = sdpa(q, k, v, scale, bias=None, causal=causal, training=True)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, inner)


class Attention(nn.Module):
    """Cosine-sim multi-head attention with fixed logit scale 8.

    q, k are l2-normalized per head-dim then rescaled by learned per-dim
    q_scale / k_scale vectors (reference attention.py:435-437, scale=8 :353).
    Spatial position handling:
      * spatial_pos='rope'  -> 2D rotary on q,k (pre-normalization order
        matches the reference: rope, then l2norm).
      * spatial_pos='rel'   -> continuous-position-bias MLP, applied only in
        'einsum' bias mode.
    Causal attention adds AliBi only in 'einsum' mode (see module docstring).
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    scale: float = 8.0
    spatial_pos: str = "rel"
    attn_bias_mode: str = "sdpa"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, is_spatial: bool = True,
                 n_frames: Optional[int] = None,
                 training: bool = False) -> jnp.ndarray:
        # Pallas fast paths have no linearization rules — under jax.grad
        # they CRASH on real TPU (the CPU test path never dispatches them),
        # so the training step always takes the autodiff-able XLA math
        was_flat = x.ndim == 2
        inner = self.dim_head * self.heads

        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        wq = self.param("to_q_kernel", nn.initializers.lecun_normal(),
                        (self.dim, inner), jnp.float32)
        wkv = self.param("to_kv_kernel", nn.initializers.lecun_normal(),
                         (self.dim, inner * 2), jnp.float32)
        wout = self.param("to_out_kernel", nn.initializers.lecun_normal(),
                          (inner, self.dim), jnp.float32)
        q_scale = self.param("q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param("k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)

        def proj_out(o):
            o = jnp.dot(o.astype(self.dtype), wout.astype(self.dtype),
                        precision=mm_precision(self.dtype),
                        preferred_element_type=jnp.float32).astype(self.dtype)
            return o.reshape(-1, self.dim) if was_flat else o

        # Token-flat 2D path: rows in ((b h w) t) order, n_frames per group.
        # The whole temporal stack (PEG / attention / FF / residuals) stays on
        # one 2D buffer; the 3D (B', n, D) form pads n -> 8 sublanes and costs
        # a relayout copy at every op boundary (trace: ~2 ms/step).
        from .kernel_grad import kernel_fwd_ref_bwd, train_kernel_fwd_ops
        from .pallas.ln_qkv import ln_qkv, ln_qkv_supported
        from .pallas.small_attn import small_n_attention_flat, small_n_supported

        if was_flat:
            assert n_frames is not None, "2D attention input needs n_frames"
            needs_bias_flat = self.attn_bias_mode == "einsum" and self.causal
            bias_tag = None if not needs_bias_flat else object()
            flat_kernels_ok = (
                self.dtype == jnp.bfloat16 and not self.is_initializing()
                and ln_qkv_supported(self.dtype, self.dim)
                and small_n_supported(n_frames, bias_tag))
            if flat_kernels_ok and not training:
                q2, kv2 = ln_qkv(x, gamma, wq, wkv)
                out = small_n_attention_flat(
                    q2, kv2, q_scale, k_scale, n=n_frames, heads=self.heads,
                    dim_head=self.dim_head, scale=self.scale, causal=self.causal)
                return proj_out(out)
            if flat_kernels_ok and training and "flat" in train_kernel_fwd_ops():
                # kernel primal / ref-math backward (ops/kernel_grad.py)
                nf, heads, dim_head, scale = (n_frames, self.heads,
                                              self.dim_head, self.scale)
                causal, dim, dtype = self.causal, self.dim, self.dtype

                def _kern(x2, g, a, b, qs, ks):
                    q2, kv2 = ln_qkv(x2, g, a, b)
                    return small_n_attention_flat(
                        q2, kv2, qs, ks, n=nf, heads=heads, dim_head=dim_head,
                        scale=scale, causal=causal)

                def _ref(x2, g, a, b, qs, ks):
                    o = _attention_ref_math(
                        x2.reshape(-1, nf, dim), g, a, b, qs, ks, dtype=dtype,
                        heads=heads, dim_head=dim_head, scale=scale,
                        causal=causal, use_rope=False)
                    return o.reshape(-1, heads * dim_head)

                out = kernel_fwd_ref_bwd(_kern, _ref)(
                    x, gamma, wq, wkv, q_scale, k_scale)
                return proj_out(out)
            x = x.reshape(-1, n_frames, self.dim)

        B, N, _ = x.shape

        # kernel primal / ref-math backward for the TRAINING forward
        # (ops/kernel_grad.py): the serving kernels have no vjp rules, so
        # their vjp is defined as rematerialized XLA math.  Mirrors the
        # serving dispatch conditions below.
        if (self.dtype == jnp.bfloat16 and training
                and not self.is_initializing()
                and "attn" in train_kernel_fwd_ops()):
            from .pallas.cosine_mha import cosine_mha, cosine_mha_supported
            from .pallas.small_attn import small_n_attention, small_n_supported

            uses_rope = self.spatial_pos == "rope" and is_spatial
            needs_bias = self.attn_bias_mode == "einsum" and (
                (self.spatial_pos == "rel" and is_spatial) or self.causal)
            bias_tag = None if not needs_bias else object()
            use_small = not uses_rope and small_n_supported(N, bias_tag)
            use_mha = cosine_mha_supported(N, bias_tag, self.causal)
            if ((use_small or use_mha)
                    and ln_qkv_supported(self.dtype, self.dim) and N % 8 == 0):
                if self.spatial_pos == "rel" and is_spatial:
                    # parameter parity: the reference instantiates the CPB
                    # MLP even when SDPA drops the bias
                    ContinuousPositionBias(dim=self.dim, heads=self.heads,
                                           name="spatial_rel_pos_bias")(
                        int(N ** 0.5), int(N ** 0.5))
                heads, dim_head, scale = self.heads, self.dim_head, self.scale
                causal, dim, dtype = self.causal, self.dim, self.dtype

                def _kern(x3, g, a, b, qs, ks):
                    q2, kv2 = ln_qkv(x3.reshape(B * N, dim), g, a, b)
                    q3 = q2.reshape(B, N, inner)
                    kv3 = kv2.reshape(B, N, 2 * inner)
                    if use_small:
                        return small_n_attention(
                            q3, kv3, qs, ks, heads=heads, dim_head=dim_head,
                            scale=scale, causal=causal)
                    return cosine_mha(q3, kv3, qs, ks, heads=heads,
                                      dim_head=dim_head, scale=scale,
                                      use_rope=uses_rope)

                def _ref(x3, g, a, b, qs, ks):
                    return _attention_ref_math(
                        x3, g, a, b, qs, ks, dtype=dtype, heads=heads,
                        dim_head=dim_head, scale=scale, causal=causal,
                        use_rope=uses_rope)

                out = kernel_fwd_ref_bwd(_kern, _ref)(
                    x, gamma, wq, wkv, q_scale, k_scale)
                return proj_out(out)

        # Reference quirk (attention.py:404-412): for self-attention the k/v
        # projection reads the PRE-norm input (kv_input is bound before
        # x = self.norm(x)); only q sees the normed tokens.  Released
        # checkpoints were trained this way.
        # (B, N, D) -> (B*N, D) is only a free bitcast when N fills whole
        # sublane tiles; temporal N=5 would force a relayout copy each way
        # (trace-verified: +1.6ms/step), so those keep the unfused path.
        prec = mm_precision(self.dtype)
        if (ln_qkv_supported(self.dtype, self.dim) and N % 8 == 0
                and not self.is_initializing() and not training):
            q2, kv2 = ln_qkv(x.reshape(B * N, self.dim), gamma, wq, wkv)
            q = q2.reshape(B, N, inner)
            kv = kv2.reshape(B, N, inner * 2)
        else:
            from .norms import _layer_norm

            xn = (_layer_norm(x) * gamma).astype(self.dtype)
            q = jnp.dot(xn, wq.astype(self.dtype), precision=prec,
                        preferred_element_type=jnp.float32).astype(self.dtype)
            kv = jnp.dot(x.astype(self.dtype), wkv.astype(self.dtype), precision=prec,
                         preferred_element_type=jnp.float32).astype(self.dtype)

        # fused Pallas fast paths on the (B, N, H*D) layout (bf16 serving
        # only — the f32 parity path keeps HIGHEST-precision XLA matmuls):
        #  * temporal N <= 8 -> small_n_attention (VPU/MXU-segmented taps)
        #  * spatial (incl. in-kernel RoPE) -> cosine_mha
        from .pallas.cosine_mha import cosine_mha, cosine_mha_supported
        from .pallas.small_attn import small_n_attention, small_n_supported

        uses_rope = self.spatial_pos == "rope" and is_spatial
        needs_bias = self.attn_bias_mode == "einsum" and (
            (self.spatial_pos == "rel" and is_spatial) or self.causal)
        fast_ok = self.dtype == jnp.bfloat16 and not training
        bias_tag = None if not needs_bias else object()
        if fast_ok and not uses_rope and small_n_supported(N, bias_tag):
            out = small_n_attention(q, kv, q_scale, k_scale,
                                    heads=self.heads, dim_head=self.dim_head,
                                    scale=self.scale, causal=self.causal)
            return proj_out(out)
        if fast_ok and cosine_mha_supported(N, bias_tag, self.causal):
            if self.spatial_pos == "rel" and is_spatial:
                # parameter parity: the reference instantiates the CPB MLP
                # even when SDPA drops the bias
                ContinuousPositionBias(dim=self.dim, heads=self.heads,
                                       name="spatial_rel_pos_bias")(
                    int(N ** 0.5), int(N ** 0.5))
            # NOTE: fusing the out-projection into the kernel (wout=...)
            # was measured NEUTRAL-to-slightly-worse (2143 -> 2126/2137
            # f/s): the in-kernel per-head partials run the MXU at a
            # 64-wide contraction and serialize behind the exp sweeps,
            # while XLA's standalone Dense runs a full 128 contraction.
            out = cosine_mha(q, kv, q_scale, k_scale,
                             heads=self.heads, dim_head=self.dim_head,
                             scale=self.scale, use_rope=uses_rope)
            return proj_out(out)

        k, v = jnp.split(kv, 2, axis=-1)

        def to_bnhd(t):
            return t.reshape(B, N, self.heads, self.dim_head)

        q, k, v = to_bnhd(q), to_bnhd(k), to_bnhd(v)

        if uses_rope:
            q, k = apply_rotary_emb_2d(q, k)

        q = l2norm(q.astype(jnp.float32)) * q_scale
        k = l2norm(k.astype(jnp.float32)) * k_scale

        # (B, H, N, D)
        q = jnp.transpose(q, (0, 2, 1, 3)).astype(self.dtype)
        k = jnp.transpose(k, (0, 2, 1, 3)).astype(self.dtype)
        v = jnp.transpose(v, (0, 2, 1, 3))

        bias = None
        if self.spatial_pos == "rel" and is_spatial:
            # parameters must exist for checkpoint compatibility even in sdpa
            # mode (the reference instantiates the MLP unconditionally)
            h = w = int(N ** 0.5)
            cpb = ContinuousPositionBias(dim=self.dim, heads=self.heads, name="spatial_rel_pos_bias")
            b = cpb(h, w)
            if self.attn_bias_mode == "einsum":
                bias = b[None]
        if self.causal and self.attn_bias_mode == "einsum":
            ab = alibi_bias(self.heads, N, N)[None]
            bias = ab if bias is None else bias + ab

        out = sdpa(q, k, v, self.scale, bias=bias, causal=self.causal,
                   training=training)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, inner)
        return proj_out(out)


class FeedForward(nn.Module):
    """LayerNorm -> Dense(2*inner, no bias) -> GEGLU -> Dense(dim, no bias).

    inner = int(mult * 2/3 * dim); GEGLU gates with exact (erf) GELU on the
    second half (reference attention.py:153-168).
    """

    dim: int
    mult: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        inner = int(self.mult * (2.0 / 3.0) * self.dim)

        # parameters live in the standard module layout either way, so
        # checkpoints and the torch converter are unaffected by the fusion
        ln_w = self.param("norm_weight", nn.initializers.ones,
                          (self.dim,), jnp.float32)
        ln_b = self.param("norm_bias", nn.initializers.zeros,
                          (self.dim,), jnp.float32)
        w1 = self.param("proj_in_kernel", nn.initializers.lecun_normal(),
                        (self.dim, inner * 2), jnp.float32)
        w2 = self.param("proj_out_kernel", nn.initializers.lecun_normal(),
                        (inner, self.dim), jnp.float32)

        from .kernel_grad import kernel_fwd_ref_bwd, train_kernel_fwd_ops
        from .pallas.geglu_ff import geglu_ff, geglu_ff_supported

        kernel_ok = (geglu_ff_supported(self.dtype, self.dim)
                     and not self.is_initializing())
        if kernel_ok and not training:
            flat = x.reshape(-1, self.dim)
            out = geglu_ff(flat.astype(self.dtype), ln_w, ln_b, w1, w2)
            return out.reshape(*x.shape[:-1], self.dim)
        if kernel_ok and training and "ff" in train_kernel_fwd_ops():
            # kernel primal / ref-math backward (ops/kernel_grad.py); the
            # kernel's tanh-GELU vs the math path's erf-GELU is a <=3e-4
            # fwd-only delta, below the bf16 noise already on this path
            dtype = self.dtype

            def _ref(f, lw, lb, a, b):
                from .norms import _layer_norm

                prec = mm_precision(dtype)
                h = (_layer_norm(f) * lw + lb).astype(dtype)
                h = jnp.dot(h, a.astype(dtype), precision=prec,
                            preferred_element_type=jnp.float32).astype(dtype)
                val, gate = jnp.split(h, 2, axis=-1)
                h = jax.nn.gelu(gate, approximate=False) * val
                return jnp.dot(h.astype(dtype), b.astype(dtype), precision=prec,
                               preferred_element_type=jnp.float32).astype(dtype)

            def _kern(f, lw, lb, a, b):
                return geglu_ff(f, lw, lb, a, b)

            flat = x.reshape(-1, self.dim)
            out = kernel_fwd_ref_bwd(_kern, _ref)(
                flat.astype(self.dtype), ln_w, ln_b, w1, w2)
            return out.reshape(*x.shape[:-1], self.dim)

        from .norms import _layer_norm

        h = (_layer_norm(x) * ln_w + ln_b).astype(self.dtype)
        prec = mm_precision(self.dtype)
        h = jnp.dot(h, w1.astype(self.dtype), precision=prec,
                    preferred_element_type=jnp.float32).astype(self.dtype)
        val, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.gelu(gate, approximate=False) * val
        return jnp.dot(h.astype(self.dtype), w2.astype(self.dtype), precision=prec,
                       preferred_element_type=jnp.float32).astype(self.dtype)


class Pooling(nn.Module):
    """Token-grid downsample ('a' avg2x2 / 'm' max2x2 / 'l' linear-4to1)."""

    pool_type: str
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        if self.pool_type in ("a", "m"):
            H = W = int(N ** 0.5)
            g = x.reshape(B, H // 2, 2, W // 2, 2, C)
            if self.pool_type == "a":
                x = g.mean(axis=(2, 4))
            else:
                x = g.max(axis=(2, 4))
            return x.reshape(B, (H // 2) * (W // 2), C)
        elif self.pool_type == "l":
            x = x.reshape(B, N // 4, 4 * C)
            return nn.Dense(self.dim, dtype=self.dtype, name="pool")(x)
        raise NotImplementedError(self.pool_type)


class Up(nn.Module):
    """Token-grid upsample ('n' nearest x2 / 'r' nearest x2 + linear)."""

    up_type: str
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H = W = int(N ** 0.5)
        g = x.reshape(B, H, W, C)
        g = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2)
        x = g.reshape(B, 4 * N, C)
        if self.up_type == "r":
            x = nn.Dense(self.dim, dtype=self.dtype, name="up")(x)
        return x
