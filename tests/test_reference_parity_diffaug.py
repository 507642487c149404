"""TRUE-ORACLE DiffAugment parity: our jax transforms vs the reference's
(/root/reference/OmniTokenizer/modules/diffaug.py:48-97), with the torch
RNG calls monkeypatched to return the exact draws our jax PRNG produced —
so the transform math (incl. the pad/clamp-scatter translation and cutout
border behaviour) is what's compared, not the RNG streams.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import ref_module  # noqa: @E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omnitokenizer_tpu.ops import diffaug as da  # noqa: E402

B, H, W, C = 3, 16, 16, 3


def _x(seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(B, H, W, C).astype(np.float32) - 0.5


def _to_torch(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _from_torch(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("name", ["brightness", "saturation", "contrast"])
def test_color_ops_parity(name, monkeypatch):
    ref = ref_module("modules.diffaug")
    x = _x(1)
    key = jax.random.PRNGKey(3)
    ours = np.asarray(getattr(da, f"rand_{name}")(key, jnp.asarray(x)))

    u = np.asarray(jax.random.uniform(key, (B, 1, 1, 1), jnp.float32))
    monkeypatch.setattr(torch, "rand",
                        lambda *s, **k: torch.from_numpy(u.copy()))
    with torch.no_grad():
        want = _from_torch(getattr(ref, f"rand_{name}")(_to_torch(x)))
    np.testing.assert_allclose(ours, want, atol=1e-6, rtol=1e-5)


def test_translation_parity(monkeypatch):
    ref = ref_module("modules.diffaug")
    x = _x(2)
    key = jax.random.PRNGKey(4)
    ours = np.asarray(da.rand_translation(key, jnp.asarray(x)))

    sx = int(H * 0.125 + 0.5)
    kx, ky = jax.random.split(key)
    tx = np.asarray(jax.random.randint(kx, (B, 1, 1), -sx, sx + 1))
    ty = np.asarray(jax.random.randint(ky, (B, 1, 1), -sx, sx + 1))
    draws = iter([tx, ty])
    monkeypatch.setattr(
        torch, "randint",
        lambda *a, **k: torch.from_numpy(next(draws).copy()).long())
    with torch.no_grad():
        want = _from_torch(ref.rand_translation(_to_torch(x)))
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_cutout_parity(monkeypatch):
    ref = ref_module("modules.diffaug")
    x = _x(3)
    key = jax.random.PRNGKey(5)
    ours = np.asarray(da.rand_cutout(key, jnp.asarray(x)))

    ch = int(H * 0.2 + 0.5)
    kx, ky = jax.random.split(key)
    ox = np.asarray(jax.random.randint(kx, (B, 1, 1), 0, H + (1 - ch % 2)))
    oy = np.asarray(jax.random.randint(ky, (B, 1, 1), 0, W + (1 - ch % 2)))
    draws = iter([ox, oy])
    monkeypatch.setattr(
        torch, "randint",
        lambda *a, **k: torch.from_numpy(next(draws).copy()).long())
    with torch.no_grad():
        want = _from_torch(ref.rand_cutout(_to_torch(x)))
    np.testing.assert_allclose(ours, want, atol=1e-6)


def test_cutout_border_box_extends_outside(monkeypatch):
    """Offsets at the extremes: the reference clamps scatter indices (the
    zeroed set is the box∩image intersection) — ours must zero the same set."""
    ref = ref_module("modules.diffaug")
    x = _x(4)
    ch = int(H * 0.2 + 0.5)
    for ox_v, oy_v in ((0, 0), (H, W), (0, W), (H, 0)):
        ox = np.full((B, 1, 1), ox_v, np.int64)
        oy = np.full((B, 1, 1), oy_v, np.int64)
        draws = iter([ox, oy])
        monkeypatch.setattr(
            torch, "randint",
            lambda *a, **k: torch.from_numpy(next(draws).copy()))
        with torch.no_grad():
            want = _from_torch(ref.rand_cutout(_to_torch(x)))

        gx = np.arange(H)[None, :, None]
        gy = np.arange(W)[None, None, :]
        inx = (gx >= ox - ch // 2) & (gx < ox - ch // 2 + ch)
        iny = (gy >= oy - ch // 2) & (gy < oy - ch // 2 + ch)
        mask = 1.0 - (inx & iny).astype(np.float32)
        np.testing.assert_allclose(x * mask[..., None], want, atol=1e-6)
