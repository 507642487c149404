"""External quantizer library — TPU-native re-designs of the vendored
lucidrains quantizers (/root/reference/OmniTokenizer/quantizer/):
 * VectorQuantize with euclidean or cosine codebooks, kmeans init and EMA
   (vector_quantize_pytorch.py:239,514,690) — used by the reference when
   --use_external_codebook;
 * FSQ — finite scalar quantization (finite_scalar_quantization.py);
 * LFQ — lookup-free (binary sign) quantization with entropy + commitment
   losses (lookup_free_quantization.py);
 * Residual stacks of each (residual_vq.py / residual_fsq.py /
   residual_lfq.py).

Everything is a pure function over explicit state; cross-replica reduction is
a psum on the given axis name (replacing the vendored all_gather DDP sync,
vector_quantize_pytorch.py:135-171).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _st(raw: jnp.ndarray, quantized: jnp.ndarray) -> jnp.ndarray:
    """straight-through estimator."""
    return raw + jax.lax.stop_gradient(quantized - raw)


# ---------------------------------------------------------------------------
# FSQ
# ---------------------------------------------------------------------------

class FSQ:
    """Finite scalar quantization: per-dim bounded tanh grid + round.

    levels e.g. (8, 5, 5, 5) -> codebook size prod(levels)."""

    def __init__(self, levels: Sequence[int]):
        self.levels = tuple(levels)
        self._levels = jnp.asarray(self.levels, jnp.float32)
        basis = np.concatenate([[1], np.cumprod(self.levels[:-1])]).astype(np.int64)
        self._basis = jnp.asarray(basis)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    @property
    def dim(self) -> int:
        return len(self.levels)

    def _bound(self, z: jnp.ndarray) -> jnp.ndarray:
        half = (self._levels - 1) * (1 + 1e-3) / 2
        offset = jnp.where(self._levels % 2 == 0, 0.5, 0.0)
        shift = jnp.tan(offset / half)
        return jnp.tanh(z + shift) * half - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """z (..., dim) -> quantized values in the normalized grid, with STE."""
        q = jnp.round(self._bound(z))
        half_width = self._levels // 2
        return _st(self._bound(z), q) / half_width

    def codes_to_indices(self, zhat: jnp.ndarray) -> jnp.ndarray:
        half_width = self._levels // 2
        z = zhat * half_width + half_width
        return jnp.sum(z * self._basis, axis=-1).astype(jnp.int32)

    def indices_to_codes(self, idx: jnp.ndarray) -> jnp.ndarray:
        codes = jnp.mod(idx[..., None] // self._basis, self._levels)
        half_width = self._levels // 2
        return (codes - half_width) / half_width

    def __call__(self, z: jnp.ndarray):
        zhat = self.quantize(z)
        return dict(embeddings=zhat,
                    encodings=self.codes_to_indices(jax.lax.stop_gradient(zhat)),
                    commitment_loss=jnp.zeros((), jnp.float32))


# ---------------------------------------------------------------------------
# LFQ
# ---------------------------------------------------------------------------

class LFQ:
    """Lookup-free quantization: codes = sign bits; losses = per-sample
    entropy (confidence) - batch entropy (diversity) + commitment."""

    def __init__(self, dim: int, entropy_loss_weight: float = 0.1,
                 diversity_gamma: float = 1.0, commitment_weight: float = 0.25,
                 inv_temperature: float = 100.0):
        self.dim = dim
        self.entropy_loss_weight = entropy_loss_weight
        self.diversity_gamma = diversity_gamma
        self.commitment_weight = commitment_weight
        self.inv_temperature = inv_temperature
        # MSB-first bit packing, matching the vendored LFQ's index contract
        # (lookup_free_quantization.py:116: mask = 2**arange(d-1, -1, -1))
        self._mask = jnp.asarray(2 ** np.arange(dim - 1, -1, -1, dtype=np.int64))

    @property
    def codebook_size(self) -> int:
        return 2 ** self.dim

    def indices_to_codes(self, idx: jnp.ndarray) -> jnp.ndarray:
        bits = (idx[..., None] & self._mask) > 0
        return jnp.where(bits, 1.0, -1.0).astype(jnp.float32)

    def __call__(self, z: jnp.ndarray, training: bool = False):
        q = jnp.where(z > 0, 1.0, -1.0)
        indices = jnp.sum((q > 0).astype(jnp.int64) * self._mask, axis=-1).astype(jnp.int32)
        quantized = _st(z, q)

        flat = z.reshape(-1, self.dim).astype(jnp.float32)
        q_flat = q.reshape(-1, self.dim).astype(jnp.float32)
        commitment = self.commitment_weight * jnp.mean(
            jnp.square(flat - jax.lax.stop_gradient(q_flat)))

        entropy_aux = jnp.zeros((), jnp.float32)
        if training:
            # per-bit bernoulli entropies (factorized form keeps it O(dim)
            # instead of O(2^dim)).  The reference's full-codebook softmax
            # (lookup_free_quantization.py:221-223: softmax(2*beta*z.c) over
            # c in {-1,+1}^d) factorizes per bit with posterior
            # sigmoid(4*beta*z_i) — the per-sample entropy is EXACT; the
            # batch (diversity) term replaces the joint entropy of the
            # batch-averaged distribution with the sum of marginal-bit
            # entropies (an upper bound; the joint is O(2^d) to compute).
            p = jax.nn.sigmoid(4 * self.inv_temperature * flat)
            eps = 1e-8
            per_sample = -(p * jnp.log(p + eps) + (1 - p) * jnp.log(1 - p + eps))
            per_sample_entropy = jnp.mean(jnp.sum(per_sample, axis=-1))
            pbar = jnp.mean(p, axis=0)
            batch_entropy = -jnp.sum(pbar * jnp.log(pbar + eps)
                                     + (1 - pbar) * jnp.log(1 - pbar + eps))
            entropy_aux = self.entropy_loss_weight * (
                per_sample_entropy - self.diversity_gamma * batch_entropy)

        return dict(embeddings=quantized, encodings=indices,
                    commitment_loss=commitment + entropy_aux)


# ---------------------------------------------------------------------------
# VectorQuantize (euclidean / cosine EMA codebooks + kmeans init)
# ---------------------------------------------------------------------------

class VQState(NamedTuple):
    embed: jnp.ndarray        # (K, D)
    cluster_size: jnp.ndarray  # (K,)
    embed_avg: jnp.ndarray    # (K, D)
    initialized: jnp.ndarray  # () int32


def vq_init_state(key: jax.Array, n_codes: int, dim: int) -> VQState:
    embed = jax.random.normal(key, (n_codes, dim), jnp.float32)
    return VQState(embed, jnp.zeros((n_codes,), jnp.float32), embed,
                   jnp.zeros((), jnp.int32))


def kmeans(key: jax.Array, samples: jnp.ndarray, n_clusters: int,
           iters: int = 10, cosine: bool = False) -> jnp.ndarray:
    """Simple kmeans(++-free) for codebook init (vendored kmeans :180)."""
    n = samples.shape[0]
    idx = jax.random.randint(key, (n_clusters,), 0, n)
    means = samples[idx]

    def step(means, _):
        if cosine:
            sim = samples @ means.T
            assign = jnp.argmax(sim, axis=1)
        else:
            d = (jnp.sum(samples ** 2, 1, keepdims=True)
                 - 2 * samples @ means.T + jnp.sum(means ** 2, 1))
            assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        counts = onehot.sum(0)
        sums = onehot.T @ samples
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), means)
        if cosine:
            new = new / jnp.maximum(jnp.linalg.norm(new, axis=-1, keepdims=True), 1e-12)
        return new, None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    return means


class VectorQuantize:
    """Functional EMA vector quantizer with euclidean or cosine similarity.

    `use_cosine_sim=True` l2-normalizes inputs and codes (CosineSimCodebook
    semantics); kmeans init runs on the first training batch."""

    def __init__(self, dim: int, codebook_size: int, decay: float = 0.8,
                 commitment_weight: float = 1.0, use_cosine_sim: bool = False,
                 kmeans_init: bool = True, kmeans_iters: int = 10,
                 eps: float = 1e-5):
        self.dim = dim
        self.codebook_size = codebook_size
        self.decay = decay
        self.commitment_weight = commitment_weight
        self.use_cosine_sim = use_cosine_sim
        self.kmeans_init = kmeans_init
        self.kmeans_iters = kmeans_iters
        self.eps = eps

    def init_state(self, key: jax.Array) -> VQState:
        return vq_init_state(key, self.codebook_size, self.dim)

    def __call__(self, z: jnp.ndarray, state: VQState, training: bool = False,
                 key: Optional[jax.Array] = None,
                 axis_name: Optional[str] = None) -> Tuple[dict, VQState]:
        bshape = z.shape[:-1]
        flat = z.reshape(-1, self.dim).astype(jnp.float32)
        if self.use_cosine_sim:
            from .attention import l2norm

            flat_n = l2norm(flat)  # zero-safe backward (commit loss path)
        else:
            flat_n = flat

        embed = state.embed
        if training and self.kmeans_init:
            assert key is not None
            cand = kmeans(key, jax.lax.stop_gradient(flat_n), self.codebook_size,
                          self.kmeans_iters, cosine=self.use_cosine_sim)
            fresh = state.initialized == 0
            embed = jnp.where(fresh, cand, embed)

        if self.use_cosine_sim:
            embed_n = embed / jnp.maximum(jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12)
            sim = flat_n @ embed_n.T
            indices = jnp.argmax(sim, axis=1).astype(jnp.int32)
            lookup = embed_n
        else:
            d = (jnp.sum(flat_n ** 2, 1, keepdims=True) - 2 * flat_n @ embed.T
                 + jnp.sum(embed ** 2, 1))
            indices = jnp.argmin(d, axis=1).astype(jnp.int32)
            lookup = embed

        quantized = lookup[indices]
        commit = self.commitment_weight * jnp.mean(
            jnp.square(flat_n - jax.lax.stop_gradient(quantized)))

        new_state = state
        if training:
            onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
            counts = onehot.sum(0)
            sums = onehot.T @ jax.lax.stop_gradient(flat_n)
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
                sums = jax.lax.psum(sums, axis_name)
            cs = state.cluster_size * self.decay + counts * (1 - self.decay)
            ea = state.embed_avg * self.decay + sums * (1 - self.decay)
            n = jnp.sum(cs)
            smoothed = (cs + self.eps) / (n + self.codebook_size * self.eps) * n
            new_embed = ea / jnp.maximum(smoothed[:, None], 1e-12)
            if self.use_cosine_sim:
                new_embed = new_embed / jnp.maximum(
                    jnp.linalg.norm(new_embed, axis=-1, keepdims=True), 1e-12)
            new_state = VQState(new_embed, cs, ea, jnp.ones((), jnp.int32))

        quant_st = _st(flat_n, quantized).reshape(*bshape, self.dim)
        return dict(embeddings=quant_st, encodings=indices.reshape(bshape),
                    commitment_loss=commit), new_state


# ---------------------------------------------------------------------------
# Residual stacks
# ---------------------------------------------------------------------------

class ResidualFSQ:
    def __init__(self, levels: Sequence[int], num_quantizers: int):
        self.layers = [FSQ(levels) for _ in range(num_quantizers)]

    def __call__(self, z: jnp.ndarray):
        residual = z
        total = jnp.zeros_like(z)
        all_idx = []
        for q in self.layers:
            out = q(residual)
            total = total + out["embeddings"]
            residual = residual - jax.lax.stop_gradient(out["embeddings"])
            all_idx.append(out["encodings"])
        return dict(embeddings=total, encodings=jnp.stack(all_idx, axis=-1),
                    commitment_loss=jnp.zeros((), jnp.float32))


class ResidualLFQ:
    def __init__(self, dim: int, num_quantizers: int, **kw):
        self.layers = [LFQ(dim, **kw) for _ in range(num_quantizers)]

    def __call__(self, z: jnp.ndarray, training: bool = False):
        residual = z
        total = jnp.zeros_like(z)
        loss = jnp.zeros((), jnp.float32)
        all_idx = []
        for q in self.layers:
            out = q(residual, training=training)
            total = total + out["embeddings"]
            residual = residual - jax.lax.stop_gradient(out["embeddings"])
            loss = loss + out["commitment_loss"]
            all_idx.append(out["encodings"])
        return dict(embeddings=total, encodings=jnp.stack(all_idx, axis=-1),
                    commitment_loss=loss)


class ResidualVQ:
    def __init__(self, dim: int, codebook_size: int, num_quantizers: int, **kw):
        self.layers = [VectorQuantize(dim, codebook_size, **kw)
                       for _ in range(num_quantizers)]

    def init_state(self, key: jax.Array):
        keys = jax.random.split(key, len(self.layers))
        return [q.init_state(k) for q, k in zip(self.layers, keys)]

    def __call__(self, z, states, training=False, key=None, axis_name=None):
        residual = z
        total = jnp.zeros_like(z)
        loss = jnp.zeros((), jnp.float32)
        all_idx, new_states = [], []
        keys = jax.random.split(key, len(self.layers)) if key is not None else [None] * len(self.layers)
        for q, st, k in zip(self.layers, states, keys):
            out, nst = q(residual, st, training=training, key=k, axis_name=axis_name)
            total = total + out["embeddings"]
            residual = residual - jax.lax.stop_gradient(out["embeddings"])
            loss = loss + out["commitment_loss"]
            all_idx.append(out["encodings"])
            new_states.append(nst)
        return dict(embeddings=total, encodings=jnp.stack(all_idx, axis=-1),
                    commitment_loss=loss), new_states
