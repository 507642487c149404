"""EMA vector-quantization codebook.

Reference semantics: /root/reference/OmniTokenizer/modules/codebook.py:11-147.
 * nearest-neighbour via expanded L2 distance + argmin
 * EMA cluster-size / embed-sum updates with decay 0.99 and Laplace smoothing
 * data-dependent init from the first training batch
 * random restart of dead codes (unless no_random_restart)
 * perplexity + batch / EMA usage telemetry

TPU-native design decisions:
 * codebook state lives in the linen 'buffers' collection and every update is
   a pure function of (state, batch) — no in-place mutation;
 * cross-replica reduction uses `jax.lax.psum` over a mesh axis name instead
   of torch.distributed.all_reduce (codebook.py:99-101); the broadcast of
   restart vectors (codebook.py:113-114) is replaced by feeding the SAME prng
   key on every replica, which is bitwise-equivalent and collective-free;
 * the distance+argmin runs through `vq_argmin`, which dispatches to a fused
   Pallas kernel on TPU (ops/pallas/vq_kernel.py) and a plain-XLA fallback
   elsewhere.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def vq_distances(flat: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """(M, D), (K, D) -> (M, K) squared L2 distances, f32."""
    flat = flat.astype(jnp.float32)
    emb = embeddings.astype(jnp.float32)
    return (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        - 2.0 * jnp.dot(flat, emb.T, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        + jnp.sum(emb * emb, axis=1)[None, :]
    )


def vq_argmin_xla(flat: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmin(vq_distances(flat, embeddings), axis=1).astype(jnp.int32)


def vq_argmin(flat: jnp.ndarray, embeddings: jnp.ndarray) -> jnp.ndarray:
    """Nearest-code indices; fused Pallas kernel on TPU, XLA elsewhere."""
    from .pallas.vq_kernel import vq_argmin_best

    return vq_argmin_best(flat, embeddings)


def make_vq_argmin_sharded(mesh, axis: str = "model"):
    """Nearest-code search with the codebook TABLE sharded over a mesh axis
    (SURVEY §2.8(d): a TP-like capability beyond the reference, for
    codebooks too large to replicate — each device scans only its
    n_codes/S slab, then an all_gather of the per-shard (min_dist, argmin)
    pairs resolves the global winner; O(S·M) combine traffic vs the
    O(M·n_codes) distance matrix).

    Returns argmin(flat (M, D) replicated, embeddings (K, D) sharded
    P(axis, None)) -> (M,) int32, identical on every device."""
    from jax.sharding import PartitionSpec as P

    def local(fl, emb_shard):
        d = vq_distances(fl, emb_shard)  # (M, K/S)
        li = jnp.argmin(d, axis=1)
        ld = jnp.min(d, axis=1)
        base = jax.lax.axis_index(axis).astype(jnp.int32) * emb_shard.shape[0]
        gi = li.astype(jnp.int32) + base
        lds = jax.lax.all_gather(ld, axis)  # (S, M)
        gis = jax.lax.all_gather(gi, axis)
        win = jnp.argmin(lds, axis=0)  # (M,)
        return jnp.take_along_axis(gis, win[None, :], axis=0)[0]

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(), P(axis, None)),
                         out_specs=P(), check_vma=False)


def _tile_to_codes(flat: jnp.ndarray, n_codes: int, key: jax.Array) -> jnp.ndarray:
    """Repeat rows (+ tiny noise) until there are >= n_codes of them
    (reference codebook.py:30-37), then return a random n_codes subset."""
    m, d = flat.shape
    if m < n_codes:
        n_repeats = (n_codes + m - 1) // m
        std = 0.01 / (d ** 0.5)
        key, sub = jax.random.split(key)
        flat = jnp.tile(flat, (n_repeats, 1))
        flat = flat + std * jax.random.normal(sub, flat.shape, flat.dtype)
    perm = jax.random.permutation(key, flat.shape[0])
    return flat[perm[:n_codes]]


class Codebook(nn.Module):
    n_codes: int
    embedding_dim: int
    no_random_restart: bool = True
    restart_thres: float = 1.0
    usage_sigma: float = 0.99
    decay: float = 0.99

    def setup(self):
        init = nn.initializers.normal(stddev=1.0)
        self.embeddings = self.variable(
            "buffers", "embeddings",
            lambda: init(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                         (self.n_codes, self.embedding_dim), jnp.float32),
        )
        self.N = self.variable("buffers", "N", lambda: jnp.zeros((self.n_codes,), jnp.float32))
        self.z_avg = self.variable("buffers", "z_avg", lambda: jnp.array(self.embeddings.value, copy=True))
        self.codebook_usage = self.variable(
            "buffers", "codebook_usage", lambda: jnp.zeros((self.n_codes,), jnp.float32))
        # 0 = needs data-dependent init; loading a checkpoint sets this to 1
        self.initialized = self.variable(
            "buffers", "initialized", lambda: jnp.zeros((), jnp.int32))
        self.call_cnt = self.variable(
            "buffers", "call_cnt", lambda: jnp.zeros((), jnp.int32))

    def lookup(self, encodings: jnp.ndarray) -> jnp.ndarray:
        """indices [...] -> embeddings [..., D] (dictionary_lookup)."""
        return jnp.take(self.embeddings.value, encodings, axis=0)

    def __call__(
        self,
        z: jnp.ndarray,
        training: bool = False,
        axis_name: Optional[str] = None,
    ):
        """z: (B, T, H, W, D) channels-last latents.

        Returns dict(embeddings, encodings, commitment_loss, perplexity,
        avg_usage, batch_usage); embeddings are straight-through and
        channels-last (B, T, H, W, D).
        """
        bshape = z.shape[:-1]
        flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)

        emb = self.embeddings.value
        if training:
            key = self.make_rng("codebook")
            init_key, restart_key = jax.random.split(key)
            # data-dependent first-batch init (codebook.py:39-51); replicas
            # share `key`, so the init is identical everywhere without a
            # broadcast collective.
            cand = _tile_to_codes(jax.lax.stop_gradient(flat), self.n_codes, init_key)
            fresh = self.initialized.value == 0
            emb = jnp.where(fresh, cand, emb)
            z_avg = jnp.where(fresh, cand, self.z_avg.value)
            n_state = jnp.where(fresh, jnp.ones_like(self.N.value), self.N.value)
        else:
            z_avg = self.z_avg.value
            n_state = self.N.value

        indices = vq_argmin(flat, emb)
        quantized_flat = jnp.take(emb, indices, axis=0)
        encodings = indices.reshape(bshape)
        quantized = quantized_flat.reshape(z.shape)

        commitment_loss = 0.25 * jnp.mean(
            jnp.square(z.astype(jnp.float32) - jax.lax.stop_gradient(quantized)))

        # scatter-add stats instead of a (M, n_codes) one-hot matrix (which
        # would materialize ~670 MB for a video batch)
        counts = jnp.zeros((self.n_codes,), jnp.float32).at[indices].add(1.0)
        avg_probs = counts / indices.shape[0]
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        batch_usage = avg_probs  # fraction of batch tokens per code

        if training:
            sg_flat = jax.lax.stop_gradient(flat)
            n_total = counts
            encode_sum = jnp.zeros((self.n_codes, self.embedding_dim),
                                   jnp.float32).at[indices].add(sg_flat)
            if axis_name is not None:
                n_total = jax.lax.psum(n_total, axis_name)
                encode_sum = jax.lax.psum(encode_sum, axis_name)
                batch_usage = jax.lax.pmean(batch_usage, axis_name)

            new_N = n_state * self.decay + n_total * (1.0 - self.decay)
            new_z_avg = z_avg * self.decay + encode_sum * (1.0 - self.decay)

            n = jnp.sum(new_N)
            weights = (new_N + 1e-7) / (n + self.n_codes * 1e-7) * n
            new_emb = new_z_avg / weights[:, None]

            if not self.no_random_restart:
                k_rand = _tile_to_codes(sg_flat, self.n_codes, restart_key)
                usage_gate = (new_N[:, None] >= self.restart_thres).astype(jnp.float32)
                new_emb = new_emb * usage_gate + k_rand * (1.0 - usage_gate)

            first_call = self.call_cnt.value == 0
            new_usage = jnp.where(
                first_call,
                batch_usage,
                self.usage_sigma * self.codebook_usage.value + (1 - self.usage_sigma) * batch_usage,
            )

            if not self.is_initializing():
                self.embeddings.value = new_emb
                self.N.value = new_N
                self.z_avg.value = new_z_avg
                self.codebook_usage.value = new_usage
                self.initialized.value = jnp.ones((), jnp.int32)
                self.call_cnt.value = self.call_cnt.value + 1
            usage_for_stats = new_usage
        else:
            usage_for_stats = self.codebook_usage.value

        avg_usage = jnp.mean((usage_for_stats > 1.0 / self.n_codes).astype(jnp.float32))

        # straight-through estimator
        z32 = z.astype(jnp.float32)
        embeddings_st = z32 + jax.lax.stop_gradient(quantized.astype(jnp.float32) - z32)

        return dict(
            embeddings=embeddings_st.astype(z.dtype),
            encodings=encodings,
            commitment_loss=commitment_loss,
            perplexity=perplexity,
            avg_usage=avg_usage,
            batch_usage=batch_usage,
        )
