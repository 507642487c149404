"""Two-optimizer GAN training for the tokenizer.

Reference semantics: /root/reference/OmniTokenizer/omnitokenizer.py:330-663 —
manual optimization with a generator Adam(0.5, 0.9) + cosine schedule and a
discriminator Adam at lr*dis_lr_multiplier; `adopt_weight` disc warm-up;
loss-threshold skip gates (:562-601); gradient clipping per optimizer.

TPU-native design:
 * the whole step is ONE jitted function over a `Mesh(('data',))`; batch is
   sharded over `data`, params replicated — XLA inserts grad all-reduces and
   the codebook-EMA reductions automatically (GSPMD), replacing DDP + the
   explicit dist.all_reduce in codebook.py:99-101;
 * one forward feeds both the G loss and (detached) the D loss instead of the
   reference's two full forwards per step (omnitokenizer.py:548,582); this
   halves compute per step.  Consequently the codebook EMA advances once per
   step instead of twice — decay semantics otherwise identical;
 * skip gates are implemented by scaling the parameter updates with a 0/1
   factor inside the compiled step (no host round-trip).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import LossConfig, TokenizerConfig, TrainConfig
from ..models.discriminator import NLayerDiscriminator, NLayerDiscriminator3D
from ..models.lpips import LPIPS, load_lpips_variables
from ..models.tokenizer import OmniTokenizerNet
from ..ops.diffaug import diff_augment, diff_augment_video
from .losses import adopt_weight, hinge_d_loss, l1, l2, logits_laplace, vanilla_d_loss


class TokenizerTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    buffers: Any
    opt_g: Any
    params_d: Any
    batch_stats_d: Any
    opt_d: Any
    lpips_params: Any
    rng: jax.Array


def _warmup_cosine(tc: TrainConfig, peak: float, warm: int, end: float) -> optax.Schedule:
    # optax counts decay_steps from step 0 (warmup included); clamp warmup
    # below the horizon (timm's scheduler allows warmup >= t_initial)
    total = max(tc.max_steps, 2)
    warm = min(max(warm, 1), total - 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=tc.warmup_lr_init, peak_value=peak,
        warmup_steps=warm, decay_steps=total, end_value=end)


def _g_schedule(tc: TrainConfig) -> optax.Schedule:
    return _warmup_cosine(tc, tc.lr, tc.warmup_steps, tc.lr_min)


def _d_schedule(tc: TrainConfig) -> optax.Schedule:
    warm = tc.dis_warmup_steps if tc.dis_warmup_steps > 0 else tc.warmup_steps
    end = tc.lr_min * tc.dis_lr_multiplier if tc.dis_minlr_multiplier else tc.lr_min
    return _warmup_cosine(tc, tc.lr * tc.dis_lr_multiplier, warm, end)


def _zero_transformer_grads(grads):
    """Zero grads under any `*_transformer` tree node (the four
    enc/dec spatial/temporal transformers, vqgan_train.py:153-157)."""

    def f(path, g):
        if any(str(getattr(k, "key", k)).endswith("_transformer") for k in path):
            return jnp.zeros_like(g)
        return g

    return jax.tree_util.tree_map_with_path(f, grads)


def _make_opt(schedule, clip: Optional[float], accum: int) -> optax.GradientTransformation:
    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.scale_by_adam(b1=0.5, b2=0.9))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def dealias_state(state):
    """Copy any pytree leaf that shares a device buffer with an earlier leaf.

    Donation (`jit_train_step(donate=True)`) requires every donated input
    buffer to appear at most once in the argument; fresh inits and msgpack
    restores can alias (e.g. identical zero tables deduped by the runtime).
    Copies only duplicates, so the one-time cost is tiny.
    """
    seen = set()

    def _buf_key(x):
        # two distinct jax.Array objects can share one underlying buffer
        # (e.g. duplicated outputs of a jitted init/restore); compare the
        # device buffer, not the Python object (ADVICE r4)
        try:
            return x.unsafe_buffer_pointer()
        except Exception:
            return id(x)

    def f(x):
        if isinstance(x, jax.Array):
            k = _buf_key(x)
            if k in seen:
                return jnp.array(x, copy=True)
            seen.add(k)
        return x

    return jax.tree_util.tree_map(f, state)


class TokenizerTrainer:
    """Builds state + the jitted train_step for a given config triple."""

    def __init__(self, cfg: TokenizerConfig, loss_cfg: LossConfig = LossConfig(),
                 train_cfg: TrainConfig = TrainConfig()):
        self.cfg = cfg
        self.loss_cfg = loss_cfg
        self.train_cfg = train_cfg
        self.net = OmniTokenizerNet(cfg)
        dk = dict(
            input_nc=cfg.image_channels, ndf=loss_cfg.disc_channels,
            n_layers=loss_cfg.disc_layers, norm_type=cfg.norm_type,
            use_sigmoid=loss_cfg.sigmoid_in_disc,
            activation=loss_cfg.activation_in_disc,
            apply_noise=loss_cfg.apply_noise,
            # aux models follow the generator's compute dtype: a bf16 run
            # with f32 discriminator/LPIPS convs pays ~4x MXU time on their
            # fwd+bwd (round-5 trace: the f32 LPIPS VGG dominated the GAN
            # step); params stay f32 either way (flax dtype semantics)
            dtype=cfg.dtype,
        )
        self.image_disc = NLayerDiscriminator(**dk)
        self.video_disc = NLayerDiscriminator3D(**dk)
        self.lpips = LPIPS(dtype=cfg.dtype)
        self.opt_g_tx = _make_opt(_g_schedule(train_cfg), train_cfg.grad_clip_val,
                                  train_cfg.grad_accumulates)
        self.opt_d_tx = _make_opt(_d_schedule(train_cfg), train_cfg.grad_clip_val_disc,
                                  train_cfg.grad_accumulates)
        self._d_loss = hinge_d_loss if loss_cfg.disc_loss_type == "hinge" else vanilla_d_loss

    # ------------------------------------------------------------------
    def init_state(self, seed: int = 0, image_size: int = 64, frames: Optional[int] = None,
                   ) -> TokenizerTrainState:
        cfg = self.cfg
        rng = jax.random.PRNGKey(seed)
        k_net, k_id, k_vd, k_cb, k_state = jax.random.split(rng, 5)
        t = frames if frames is not None else 1 + cfg.temporal_patch_size
        dummy = jnp.zeros((1, t, image_size, image_size, cfg.image_channels), jnp.float32)
        net_vars = self.net.init({"params": k_net, "codebook": k_cb, "gaussian": k_cb},
                                 dummy, False, training=True)
        id_vars = self.image_disc.init(k_id, dummy[:, 0], train=False)
        vd_vars = self.video_disc.init(k_vd, dummy, train=False)
        lpips_vars, _ = load_lpips_variables()

        params_d = {"image": id_vars["params"], "video": vd_vars["params"]}
        batch_stats_d = {
            "image": id_vars.get("batch_stats", {}),
            "video": vd_vars.get("batch_stats", {}),
        }
        return TokenizerTrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=net_vars["params"],
            buffers=net_vars["buffers"],
            opt_g=self.opt_g_tx.init(net_vars["params"]),
            params_d=params_d,
            batch_stats_d=batch_stats_d,
            opt_d=self.opt_d_tx.init(params_d),
            lpips_params=lpips_vars["params"],
            rng=k_state,
        )

    # ------------------------------------------------------------------
    def _disc_apply(self, which: str, params, stats, x, train, noise_rng, mutable=False):
        mod = self.image_disc if which == "image" else self.video_disc
        variables = {"params": params[which]}
        if stats[which]:
            variables["batch_stats"] = stats[which]
        # BatchNorm in train mode always writes running stats; run with the
        # collection mutable and only keep the update when requested.
        (logits, feats), updated = mod.apply(
            variables, x, train=train, noise_rng=noise_rng, mutable=["batch_stats"])
        if mutable:
            return logits, feats, updated.get("batch_stats", stats[which])
        return logits, feats, stats[which]

    def _perceptual(self, lpips_params, frames, frames_recon):
        return jnp.mean(self.lpips.apply({"params": lpips_params}, frames, frames_recon))

    # ------------------------------------------------------------------
    def train_step(self, state: TokenizerTrainState, video: jnp.ndarray,
                   ) -> Tuple[TokenizerTrainState, Dict[str, jnp.ndarray]]:
        """One G+D step.  `video`: channels-last (B, T, H, W, C), T>=1.
        Call under jit with the batch sharded over the data mesh axis."""
        cfg, lc, tc = self.cfg, self.loss_cfg, self.train_cfg
        is_image = video.shape[1] == 1
        T = video.shape[1]
        B = video.shape[0]

        (rng, k_frame, k_aug_d, k_aug_g, k_cb, k_noise1, k_noise2, k_noise3,
         k_gauss, k_cb2) = jax.random.split(state.rng, 10)

        frame_idx = jax.random.randint(k_frame, (B,), 0, T)

        def pick_frames(v):
            return v[jnp.arange(B), frame_idx]  # (B, H, W, C)

        disc_factor = adopt_weight(state.step, lc.discriminator_iter_start)

        # ---------------- generator pass ----------------
        def g_loss_fn(params_g):
            variables = {"params": params_g, "buffers": state.buffers}
            (x_recon, aux), mutated = self.net.apply(
                variables, video, is_image, training=not cfg.use_vae,
                rngs={"codebook": k_cb, "gaussian": k_gauss},
                mutable=["buffers"])

            if lc.recon_loss_type == "l1":
                recon_loss = l1(x_recon, video) * lc.l1_weight
            else:
                recon_loss = l2(x_recon, video) * lc.l1_weight
                recon_loss = recon_loss + logits_laplace(video, x_recon) * lc.logitslaplace_weight

            frames = pick_frames(video)
            frames_recon = pick_frames(x_recon)
            if lc.apply_allframes:
                frames = video.reshape(-1, *video.shape[2:])
                frames_recon = x_recon.reshape(-1, *x_recon.shape[2:])

            perceptual_loss = 0.0
            if lc.perceptual_weight > 0:
                perceptual_loss = self._perceptual(
                    state.lpips_params, frames, frames_recon) * lc.perceptual_weight

            noise_rng = k_noise1 if lc.apply_noise else None
            logits_image_fake, pred_image_fake, _ = self._disc_apply(
                "image", state.params_d, state.batch_stats_d, frames_recon,
                train=True, noise_rng=noise_rng)
            g_image_loss = -jnp.mean(logits_image_fake)

            if not is_image:
                logits_video_fake, pred_video_fake, _ = self._disc_apply(
                    "video", state.params_d, state.batch_stats_d, x_recon,
                    train=True, noise_rng=noise_rng)
                g_video_loss = -jnp.mean(logits_video_fake)
            else:
                pred_video_fake = None
                g_video_loss = 0.0

            g_loss = lc.image_gan_weight * g_image_loss + lc.video_gan_weight * g_video_loss
            aeloss = disc_factor * g_loss

            # feature matching (omnitokenizer.py:447-463)
            feat_weights = 4.0 / (3 + 1)
            image_gan_feat_loss = 0.0
            video_gan_feat_loss = 0.0
            if lc.image_gan_weight > 0:
                _, pred_image_real, _ = self._disc_apply(
                    "image", state.params_d, state.batch_stats_d, frames,
                    train=True, noise_rng=noise_rng)
                for f, r in zip(pred_image_fake[:-1], pred_image_real[:-1]):
                    image_gan_feat_loss += feat_weights * l1(f, jax.lax.stop_gradient(r))
            if lc.video_gan_weight > 0 and not is_image:
                _, pred_video_real, _ = self._disc_apply(
                    "video", state.params_d, state.batch_stats_d, video,
                    train=True, noise_rng=noise_rng)
                for f, r in zip(pred_video_fake[:-1], pred_video_real[:-1]):
                    video_gan_feat_loss += feat_weights * l1(f, jax.lax.stop_gradient(r))
            gan_feat_loss = disc_factor * lc.gan_feat_weight * (
                image_gan_feat_loss + video_gan_feat_loss)

            commitment_loss = aux["commitment_loss"]
            total = (recon_loss + commitment_loss + aeloss + perceptual_loss + gan_feat_loss)
            metrics = dict(
                recon_loss=recon_loss, commitment_loss=commitment_loss,
                aeloss=aeloss, perceptual_loss=perceptual_loss,
                gan_feat_loss=gan_feat_loss,
            )
            if not cfg.use_vae:
                metrics["perplexity"] = aux["perplexity"]
                metrics["avg_usage"] = aux["avg_usage"]
            return total, (metrics, mutated["buffers"], x_recon, frames, frames_recon)

        (g_total, (metrics, new_buffers, x_recon, frames, frames_recon)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_g))

        # skip gates (omnitokenizer.py:562-575)
        optim_gen = jnp.ones((), jnp.float32)
        if tc.recloss_check_thres is not None:
            optim_gen = optim_gen * jnp.where(
                (state.step > 100_000) & (metrics["recon_loss"] > tc.recloss_check_thres),
                0.0, 1.0)
        if tc.perloss_check_thres is not None:
            optim_gen = optim_gen * jnp.where(
                (state.step > 100_000) & (metrics["perceptual_loss"] > tc.perloss_check_thres),
                0.0, 1.0)

        g_grads = jax.tree_util.tree_map(lambda g: g / tc.grad_accumulates, g_grads)
        if tc.freeze_trans:
            # finetune-stage freeze (vqgan_train.py:153-157): zero the grads of
            # every *_transformer subtree BEFORE the optimizer, so global-norm
            # clipping sees only the trainable parameters, like torch's
            # requires_grad=False
            g_grads = _zero_transformer_grads(g_grads)
        g_updates, new_opt_g = self.opt_g_tx.update(g_grads, state.opt_g, state.params_g)
        g_updates = jax.tree_util.tree_map(lambda u: u * optim_gen, g_updates)
        new_params_g = optax.apply_updates(state.params_g, g_updates)

        if tc.ema_advances_per_step == 2 and not cfg.use_vae:
            # reference dynamics: the D pass re-runs the generator with the
            # UPDATED params, advancing the codebook EMA a second time on the
            # same batch (omnitokenizer.py:548 then :582).  Costs one extra
            # encoder forward per step, like the reference's two-forward loop.
            variables2 = {"params": new_params_g, "buffers": new_buffers}
            h2 = jax.lax.stop_gradient(self.net.apply(
                variables2, video, is_image,
                method=OmniTokenizerNet.encode_latent))
            _, mut2 = self.net.apply(
                variables2, h2, True, None,
                method=OmniTokenizerNet.quantize,
                mutable=["buffers"], rngs={"codebook": k_cb2})
            new_buffers = mut2["buffers"]

        # ---------------- discriminator pass ----------------
        x_recon_sg = jax.lax.stop_gradient(x_recon)
        frames_sg = jax.lax.stop_gradient(frames)
        frames_recon_sg = jax.lax.stop_gradient(frames_recon)

        def prep_img(x, key):
            if lc.apply_diffaug:
                return diff_augment(key, x)
            return x

        def prep_vid(x, key):
            if lc.apply_diffaug:
                return diff_augment_video(key, x)
            return x

        def d_loss_fn(params_d):
            noise_rng = k_noise2 if lc.apply_noise else None
            stats1 = state.batch_stats_d
            lr_real, _, s_img = self._disc_apply(
                "image", params_d, stats1, prep_img(frames_sg, k_aug_d),
                train=True, noise_rng=noise_rng, mutable=True)
            stats2 = {**stats1, "image": s_img}
            lr_fake, _, s_img2 = self._disc_apply(
                "image", params_d, stats2, prep_img(frames_recon_sg, k_aug_g),
                train=True, noise_rng=k_noise3 if lc.apply_noise else None, mutable=True)
            d_image_loss = self._d_loss(lr_real, lr_fake)

            if not is_image:
                lv_real, _, s_vid = self._disc_apply(
                    "video", params_d, stats2, prep_vid(video, k_aug_d),
                    train=True, noise_rng=noise_rng, mutable=True)
                stats3 = {**stats2, "image": s_img2, "video": s_vid}
                lv_fake, _, s_vid2 = self._disc_apply(
                    "video", params_d, stats3, prep_vid(x_recon_sg, k_aug_g),
                    train=True, noise_rng=k_noise3 if lc.apply_noise else None, mutable=True)
                d_video_loss = self._d_loss(lv_real, lv_fake)
                new_stats = {"image": s_img2, "video": s_vid2}
            else:
                d_video_loss = 0.0
                new_stats = {**stats2, "image": s_img2}

            discloss = disc_factor * (
                lc.image_gan_weight * d_image_loss + lc.video_gan_weight * d_video_loss)
            return discloss, (d_image_loss, d_video_loss, new_stats)

        (discloss, (d_image_loss, d_video_loss, new_stats_d)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d))

        # D gate is independent of the G gate: the reference gates the two
        # optimizers separately (omnitokenizer.py:562-575 vs :595-601) — a
        # skipped G step must NOT skip the D step.
        optim_disc = jnp.ones((), jnp.float32)
        if tc.disloss_check_thres is not None:
            optim_disc = optim_disc * jnp.where(discloss < tc.disloss_check_thres, 0.0, 1.0)

        d_grads = jax.tree_util.tree_map(lambda g: g / tc.grad_accumulates, d_grads)
        d_updates, new_opt_d = self.opt_d_tx.update(d_grads, state.opt_d, state.params_d)
        d_updates = jax.tree_util.tree_map(lambda u: u * optim_disc, d_updates)
        new_params_d = optax.apply_updates(state.params_d, d_updates)

        metrics.update(discloss=discloss, d_image_loss=d_image_loss,
                       d_video_loss=d_video_loss, g_total=g_total,
                       optim_gen=optim_gen, optim_disc=optim_disc)

        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g, buffers=new_buffers, opt_g=new_opt_g,
            params_d=new_params_d, batch_stats_d=new_stats_d, opt_d=new_opt_d,
            rng=rng,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def jit_train_step(self, mesh=None, donate: bool = True):
        """Return a jitted train_step; with a mesh, batch is data-sharded and
        state replicated (GSPMD inserts the collectives).

        `donate=True` donates the state argument so params + both optimizer
        states are updated in place — without it every step pays a full
        params+opt-state HBM copy. Callers must not reuse a state object
        after passing it in (the loop/CLIs thread `state = step(state, v)`
        and never touch the old one). Pass any state through
        `dealias_state` first: a freshly-built or deserialized state can
        hold the same buffer at two leaves, which XLA rejects when donated.
        """
        if donate:
            return jax.jit(self.train_step, donate_argnums=0)
        return jax.jit(self.train_step)
