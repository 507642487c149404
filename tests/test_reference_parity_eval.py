"""TRUE-ORACLE eval-stack parity: the actual reference I3D
(/root/reference/OmniTokenizer/fvd/pytorch_i3d.py) with random weights,
converted by eval/i3d.load_i3d_variables, must match our flax InceptionI3d
forward; the Fréchet-distance math must match fvd/fvd.py:56-112; the
LPIPS stack (real shipped lin weights + the stubbed deterministic VGG16
backbone) must match modules/lpips.py end to end; and the vendored
pytorch-fid InceptionV3 (FIDInception{A,C,E} forwards from
evaluation/pytorch-fid/src/pytorch_fid/inception.py, run against a
faithful torchvision-inception stub) must match eval/inception.py after
weight conversion.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import (ref_module, install_stubs,  # noqa: E402
                              ref_pytorch_fid_inception)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.mark.slow
def test_i3d_forward_parity(tmp_path):
    install_stubs()
    import importlib

    pi3d = importlib.import_module("OmniTokenizer.fvd.pytorch_i3d")
    torch.manual_seed(0)
    ref = pi3d.InceptionI3d(400, in_channels=3).eval()
    path = str(tmp_path / "i3d.pt")
    torch.save(ref.state_dict(), path)

    from omnitokenizer_tpu.eval.i3d import InceptionI3d, load_i3d_variables

    variables, pretrained = load_i3d_variables(path)
    assert pretrained

    g = torch.Generator().manual_seed(1)
    # the final avg pool kernel (2,7,7) needs >=224^2 spatial input
    x = torch.rand(1, 3, 16, 224, 224, generator=g) * 2 - 1  # (B, C, T, H, W)
    with torch.no_grad():
        logits_t = ref(x).numpy()

    xl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))  # channels-last
    logits_j = np.asarray(InceptionI3d().apply(variables, xl))
    np.testing.assert_allclose(logits_j, logits_t, atol=5e-4, rtol=1e-3)


def test_frechet_distance_parity():
    install_stubs()
    # fvd.py imports sklearn (available); reuse its exact torch math
    import importlib

    rfvd = importlib.import_module("OmniTokenizer.fvd.fvd")
    g = torch.Generator().manual_seed(2)
    a = torch.randn(64, 16, generator=g)
    b = torch.randn(48, 16, generator=g) * 1.3 + 0.2
    fd_t = float(rfvd.frechet_distance(a, b))

    from omnitokenizer_tpu.eval.frechet import frechet_distance

    fd_j = float(frechet_distance(np.asarray(a), np.asarray(b)))
    np.testing.assert_allclose(fd_j, fd_t, rtol=1e-4)


def test_lpips_forward_parity():
    """Reference LPIPS (real shipped lin weights + deterministic stub VGG16)
    vs our flax LPIPS with the same tensors converted."""
    lpips_mod = ref_module("modules.lpips")
    ref = lpips_mod.LPIPS().eval()

    # convert the reference's exact state (backbone + lins) to flax
    from omnitokenizer_tpu.models.lpips import LPIPS, load_lpips_variables

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables, _ = load_lpips_variables()
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))

    # VGG16 conv layers appear in slice order; flax side names conv_{i}
    conv_keys = [k for k in sd if k.startswith("net.slice") and k.endswith(".weight")]

    def slice_order(k):
        _, sl, idx, _ = k.split(".")
        return (int(sl.replace("slice", "")), int(idx))

    conv_keys.sort(key=slice_order)
    net = dict(params["net"])
    flax_convs = sorted((k for k in net if k.startswith("conv")),
                        key=lambda s: int(s[4:]))  # conv0..conv12
    assert len(conv_keys) == len(flax_convs), (conv_keys, flax_convs)
    for tk, fk in zip(conv_keys, flax_convs):
        w = sd[tk]
        net[fk] = dict(net[fk])
        net[fk]["kernel"] = np.transpose(w, (2, 3, 1, 0))
        net[fk]["bias"] = sd[tk.replace(".weight", ".bias")]
    params["net"] = net
    for i in range(5):
        params[f"lin{i}"] = sd[f"lin{i}.model.1.weight"].reshape(-1)

    g = torch.Generator().manual_seed(3)
    x = torch.rand(2, 3, 64, 64, generator=g) - 0.5
    y = torch.rand(2, 3, 64, 64, generator=g) - 0.5
    with torch.no_grad():
        d_t = ref(x, y).numpy().reshape(-1)

    model = LPIPS()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    yj = jnp.asarray(np.transpose(y.numpy(), (0, 2, 3, 1)))
    d_j = np.asarray(model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, xj, yj)).reshape(-1)
    np.testing.assert_allclose(d_j, d_t, atol=1e-5, rtol=1e-3)


def _build_random_fid_inception(seed: int = 11):
    """fid_inception_v3() minus the weight download
    (inception.py:203-216): the reference's own FIDInception blocks on the
    torchvision-stub Inception3, deterministically randomized."""
    inc_mod = ref_pytorch_fid_inception()
    inc = inc_mod._inception_v3(num_classes=1008, aux_logits=False, weights=None)
    inc.Mixed_5b = inc_mod.FIDInceptionA(192, pool_features=32)
    inc.Mixed_5c = inc_mod.FIDInceptionA(256, pool_features=64)
    inc.Mixed_5d = inc_mod.FIDInceptionA(288, pool_features=64)
    inc.Mixed_6b = inc_mod.FIDInceptionC(768, channels_7x7=128)
    inc.Mixed_6c = inc_mod.FIDInceptionC(768, channels_7x7=160)
    inc.Mixed_6d = inc_mod.FIDInceptionC(768, channels_7x7=160)
    inc.Mixed_6e = inc_mod.FIDInceptionC(768, channels_7x7=192)
    inc.Mixed_7b = inc_mod.FIDInceptionE_1(1280)
    inc.Mixed_7c = inc_mod.FIDInceptionE_2(2048)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in inc.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in inc.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
    return inc_mod, inc.eval()


@pytest.mark.slow
def test_inception_fid_forward_parity(tmp_path, monkeypatch):
    """Reference pytorch-fid InceptionV3 wrapper (blocks 0-3, pool3 output)
    vs our converted flax FIDInceptionV3: features, sFID spatial tap, and
    fc logits."""
    inc_mod, inc = _build_random_fid_inception()
    path = str(tmp_path / "pt_inception.pth")
    torch.save(inc.state_dict(), path)

    # hook the sFID tap: Mixed_6d 1x1 branch (evaluator.py 'mixed_6/conv')
    taps = {}
    inc.Mixed_6d.branch1x1.register_forward_hook(
        lambda m, i, o: taps.__setitem__("sp", o.detach()))

    monkeypatch.setattr(inc_mod, "fid_inception_v3", lambda: inc)
    wrapper = inc_mod.InceptionV3(output_blocks=[3], resize_input=False,
                                  normalize_input=False).eval()

    g = torch.Generator().manual_seed(12)
    x = torch.rand(2, 3, 128, 128, generator=g) * 2 - 1
    with torch.no_grad():
        pool_t = wrapper(x)[0].squeeze(-1).squeeze(-1).numpy()      # (B, 2048)
        logits_t = inc.fc(torch.from_numpy(pool_t)).numpy()
    sp_t = np.transpose(taps["sp"].numpy(), (0, 2, 3, 1))[..., :7]

    import jax
    import jax.numpy as jnp
    from omnitokenizer_tpu.eval.inception import (FIDInceptionV3,
                                                  load_inception_variables)

    variables, pretrained = load_inception_variables(path)
    assert pretrained
    model = FIDInceptionV3()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    pool_j, inter = model.apply(variables, xj, mutable=["intermediates"])
    logits_j = model.apply(variables, xj, True)
    sp_j = np.asarray(
        inter["intermediates"]["Mixed_6d"]["spatial_tap"][0][..., :7])

    np.testing.assert_allclose(np.asarray(pool_j), pool_t, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(sp_j, sp_t, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=5e-3, rtol=1e-3)
