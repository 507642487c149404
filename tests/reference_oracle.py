"""True-oracle harness: import the ACTUAL reference torch implementation from
/root/reference (read-only) so parity tests compare against the real thing
rather than hand-written torch re-implementations.

The reference needs pytorch_lightning / torchvision / timm / beartype /
fairscale, none of which are installed.  Each is stubbed with the minimal
surface the reference modules actually touch:

- pytorch_lightning.LightningModule  -> nn.Module + no-op save_hyperparameters/log
  (omnitokenizer.py:63, lm_transformer.py:19, base.py:38)
- torchvision.models.vgg16           -> deterministic randomly-initialized VGG16
  (lpips.py:9,122; the torchvision download is unavailable, and random weights
  are *better* for parity: we convert the exact same tensors to flax)
- timm.models.layers.{DropPath,to_2tuple,trunc_normal_}, timm.scheduler.cosine_lr
  (attention.py:10, omnitokenizer.py:12)
- beartype.beartype                  -> identity decorator (attention.py:5)
- fairscale.nn.checkpoint_wrapper    -> identity (attention.py:11)

The OmniTokenizer package itself is registered with __path__ pointing at the
reference WITHOUT executing its __init__.py (which drags in decord/h5py/
transformers via data.py) — submodules like OmniTokenizer.omnitokenizer import
cleanly on their own.
"""

from __future__ import annotations

import argparse
import functools
import importlib
import importlib.machinery
import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def _mk_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _build_vgg16_features() -> nn.Sequential:
    # torchvision VGG16 "D" configuration — lpips.py slices features[:31]
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_c, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_c = v
    return nn.Sequential(*layers)


class _StubVGG(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _build_vgg16_features()


def _stub_vgg16(pretrained: bool = False, **kw) -> _StubVGG:
    """Deterministic 'pretrained' stand-in: same weights on every call, so a
    converted copy on the flax side sees identical tensors."""
    m = _StubVGG()
    g = torch.Generator().manual_seed(20240817)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
    return m


def install_stubs() -> None:
    if "pytorch_lightning" not in sys.modules:
        pl = _mk_module("pytorch_lightning")

        class LightningModule(nn.Module):
            def __init__(self):
                super().__init__()
                self.global_step = 0

            def save_hyperparameters(self, *a, **kw):
                pass

            def log(self, *a, **kw):
                pass

            @classmethod
            def load_from_checkpoint(cls, path, strict=True, **kw):
                # minimal Lightning mechanics: re-instantiate from the
                # embedded hparams namespace, then load_state_dict
                ckpt = torch.load(path, map_location="cpu", weights_only=False)
                args = ckpt["hyper_parameters"]["args"]
                model = cls(args)
                model.load_state_dict(ckpt["state_dict"], strict=strict)
                return model

        class LightningDataModule:
            pass

        pl.LightningModule = LightningModule
        pl.LightningDataModule = LightningDataModule
        cbs = _mk_module("pytorch_lightning.callbacks")

        class Callback:
            pass

        cbs.Callback = Callback
        pl.callbacks = cbs

    if "torchvision" not in sys.modules:
        tv = _mk_module("torchvision")
        models = _mk_module("torchvision.models")
        models.vgg16 = _stub_vgg16
        tv.models = models

    if "timm" not in sys.modules:
        timm = _mk_module("timm")
        sched = _mk_module("timm.scheduler")
        cosine = _mk_module("timm.scheduler.cosine_lr")

        class CosineLRScheduler:
            def __init__(self, *a, **kw):
                pass

            def step_update(self, *a, **kw):
                pass

        cosine.CosineLRScheduler = cosine_cls = CosineLRScheduler
        sched.cosine_lr = cosine
        timm.scheduler = sched
        tm_models = _mk_module("timm.models")
        layers = _mk_module("timm.models.layers")

        class DropPath(nn.Identity):
            def __init__(self, *a, **kw):
                super().__init__()

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        tm_models.layers = layers
        timm.models = tm_models
        del cosine_cls

    if "beartype" not in sys.modules:
        bt = _mk_module("beartype")
        bt.beartype = lambda fn: fn

    if "fairscale" not in sys.modules:
        fs = _mk_module("fairscale")
        fsnn = _mk_module("fairscale.nn")
        fsnn.checkpoint_wrapper = lambda mod, **kw: mod
        fs.nn = fsnn

    if "OmniTokenizer" not in sys.modules:
        pkg = types.ModuleType("OmniTokenizer")
        pkg.__path__ = [f"{REFERENCE_ROOT}/OmniTokenizer"]
        pkg.__package__ = "OmniTokenizer"
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "OmniTokenizer", loader=None, is_package=True)
        pkg.__spec__.submodule_search_locations = pkg.__path__
        sys.modules["OmniTokenizer"] = pkg


@functools.lru_cache(maxsize=None)
def ref_module(name: str):
    """Import a reference submodule, e.g. ref_module('omnitokenizer')."""
    install_stubs()
    return importlib.import_module(f"OmniTokenizer.{name}")


def make_vqgan_args(**overrides) -> argparse.Namespace:
    """Build the full args namespace from the reference's OWN parsers
    (base.py:245 + omnitokenizer.py:694), plus the data-layer fields the
    model reads (resolution/sequence_length/image_channels, data.py:551-577)."""
    om = ref_module("omnitokenizer")
    base = ref_module("base")
    parser = argparse.ArgumentParser(add_help=False)
    parser = base.VQGAN.add_model_specific_args(parser)
    parser = om.VQGAN.add_model_specific_args(parser)
    args, _ = parser.parse_known_args([])
    # data flags the model consumes (reference gets these from VideoData)
    args.resolution = 64
    args.sequence_length = 5
    args.image_channels = 3
    args.sample_every_n_frames = 1
    for k, v in overrides.items():
        setattr(args, k, v)
    if args.codebook_dim is None:
        args.codebook_dim = args.embedding_dim
    return args


def lightning_ckpt_bytes(model) -> bytes:
    """Serialize a reference model the way Lightning does: state_dict +
    embedded hparams namespace (omnitokenizer.py:208)."""
    import io

    buf = io.BytesIO()
    torch.save(
        {"state_dict": model.state_dict(),
         "hyper_parameters": {"args": model.args}},
        buf,
    )
    return buf.getvalue()


def make_net2net_args(vqvae_path: str, **overrides) -> argparse.Namespace:
    """Args namespace for the reference Net2NetTransformer
    (lm_transformer.py:462-493 parser + the driver-level flags it reads)."""
    lm = ref_module("lm_transformer")
    parser = argparse.ArgumentParser(add_help=False)
    parser = lm.Net2NetTransformer.add_model_specific_args(parser)
    args, _ = parser.parse_known_args([])
    args.vqvae = vqvae_path
    args.tokenizer = "omnitokenizer"
    args.vtokens = False
    args.vtokens_pos = False
    args.class_cond_dim = 10
    for k, v in overrides.items():
        setattr(args, k, v)
    return args
