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
    # a real ModuleSpec so importlib.util.find_spec probes (e.g. transformers
    # checking for timm) see a valid module instead of raising
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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


def _build_inception_stub() -> types.ModuleType:
    """Faithful stand-in for `torchvision.models.inception` (the standard
    public torchvision Inception3, BN eps 1e-3, conv bias=False) — enough
    for the vendored pytorch-fid model, whose FIDInception{A,C,E_1,E_2}
    classes subclass these and whose fid_inception_v3() builds through
    torchvision.models.inception_v3
    (/root/reference/evaluation/pytorch-fid/src/pytorch_fid/inception.py)."""
    import torch.nn.functional as F

    mod = _mk_module("torchvision.models.inception")

    class BasicConv2d(nn.Module):
        def __init__(self, in_channels, out_channels, **kwargs):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, bias=False, **kwargs)
            self.bn = nn.BatchNorm2d(out_channels, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    class InceptionA(nn.Module):
        def __init__(self, in_channels, pool_features, conv_block=None):
            super().__init__()
            cb = conv_block or BasicConv2d
            self.branch1x1 = cb(in_channels, 64, kernel_size=1)
            self.branch5x5_1 = cb(in_channels, 48, kernel_size=1)
            self.branch5x5_2 = cb(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
            self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, padding=1)
            self.branch_pool = cb(in_channels, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b5, b3, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or BasicConv2d
            self.branch3x3 = cb(in_channels, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
            self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class InceptionC(nn.Module):
        def __init__(self, in_channels, channels_7x7, conv_block=None):
            super().__init__()
            cb = conv_block or BasicConv2d
            c7 = channels_7x7
            self.branch1x1 = cb(in_channels, 192, kernel_size=1)
            self.branch7x7_1 = cb(in_channels, c7, kernel_size=1)
            self.branch7x7_2 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = cb(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = cb(in_channels, c7, kernel_size=1)
            self.branch7x7dbl_2 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = cb(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = cb(in_channels, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or BasicConv2d
            self.branch3x3_1 = cb(in_channels, 192, kernel_size=1)
            self.branch3x3_2 = cb(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = cb(in_channels, 192, kernel_size=1)
            self.branch7x7x3_2 = cb(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = cb(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = cb(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class InceptionE(nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or BasicConv2d
            self.branch1x1 = cb(in_channels, 320, kernel_size=1)
            self.branch3x3_1 = cb(in_channels, 384, kernel_size=1)
            self.branch3x3_2a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = cb(in_channels, 448, kernel_size=1)
            self.branch3x3dbl_2 = cb(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = cb(in_channels, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b3, bd, bp], 1)

    class Inception3(nn.Module):
        def __init__(self, num_classes=1000, aux_logits=True,
                     transform_input=False, inception_blocks=None,
                     init_weights=None, dropout=0.5):
            super().__init__()
            self.aux_logits = aux_logits
            self.transform_input = transform_input
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.maxpool1 = nn.MaxPool2d(kernel_size=3, stride=2)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.maxpool2 = nn.MaxPool2d(kernel_size=3, stride=2)
            self.Mixed_5b = InceptionA(192, pool_features=32)
            self.Mixed_5c = InceptionA(256, pool_features=64)
            self.Mixed_5d = InceptionA(288, pool_features=64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, channels_7x7=128)
            self.Mixed_6c = InceptionC(768, channels_7x7=160)
            self.Mixed_6d = InceptionC(768, channels_7x7=160)
            self.Mixed_6e = InceptionC(768, channels_7x7=192)
            assert not aux_logits, "stub covers the pytorch-fid path only"
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.dropout = nn.Dropout(p=dropout)
            self.fc = nn.Linear(2048, num_classes)

        def forward(self, x):
            for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                         "maxpool1", "Conv2d_3b_1x1", "Conv2d_4a_3x3",
                         "maxpool2", "Mixed_5b", "Mixed_5c", "Mixed_5d",
                         "Mixed_6a", "Mixed_6b", "Mixed_6c", "Mixed_6d",
                         "Mixed_6e", "Mixed_7a", "Mixed_7b", "Mixed_7c",
                         "avgpool", "dropout"):
                x = getattr(self, name)(x)
            return self.fc(torch.flatten(x, 1))

    def inception_v3(*args, weights=None, progress=True, **kwargs):
        assert weights is None and not args
        kwargs.pop("init_weights", None)
        return Inception3(**kwargs)

    for cls in (BasicConv2d, InceptionA, InceptionB, InceptionC, InceptionD,
                InceptionE, Inception3):
        setattr(mod, cls.__name__, cls)
    mod.inception_v3 = inception_v3
    return mod


def _build_vit_stub() -> types.ModuleType:
    """Faithful stand-in for timm.models.vision_transformer's PatchEmbed /
    Attention / Mlp — the three public timm blocks the vendored DiT and
    Latte models build from (Diffusion/DiT/models.py:16,
    Diffusion/Latte/models/latte.py:17)."""
    mod = _mk_module("timm.models.vision_transformer")

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True):
            super().__init__()
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # (B, N, D)
            return self.norm(x)

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0, **kwargs):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            B, N, C = x.shape
            qkv = (self.qkv(x)
                   .reshape(B, N, 3, self.num_heads, C // self.num_heads)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = self.attn_drop(attn.softmax(dim=-1))
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj_drop(self.proj(x))

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0, bias=True):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    mod.PatchEmbed = PatchEmbed
    mod.Attention = Attention
    mod.Mlp = Mlp
    return mod


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
        tv.__version__ = "0.15.2"
        models = _mk_module("torchvision.models")
        models.vgg16 = _stub_vgg16
        models.inception = _build_inception_stub()
        models.inception_v3 = models.inception.inception_v3
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
        tm_models.vision_transformer = _build_vit_stub()
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


class _CvVideoReader:
    """decord.VideoReader stand-in backed by cv2 (video_utils.py:206-240
    call surface: len, get_avg_fps, get_batch(idx).asnumpy()).  decord's
    decode-time width/height resize is FFmpeg-swscale bilinear; the cv2
    INTER_LINEAR here differs at the last bit, so e2e parity fixtures author
    frames AT the target resolution (resize becomes identity, and cv2 mp4v
    decode is bit-exact vs our native libav decoder — tests/test_native_video)."""

    def __init__(self, path, width=None, height=None, **kw):
        import cv2

        cap = cv2.VideoCapture(str(path))
        if not cap.isOpened():
            raise RuntimeError(f"cannot open {path}")
        self._fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if width and height and (frame.shape[1] != width
                                     or frame.shape[0] != height):
                frame = cv2.resize(frame, (width, height),
                                   interpolation=cv2.INTER_LINEAR)
            frames.append(frame)
        cap.release()
        import numpy as np

        self._frames = np.stack(frames) if frames else np.zeros(
            (0, height or 0, width or 0, 3), "uint8")

    def __len__(self):
        return len(self._frames)

    def get_avg_fps(self):
        return self._fps

    def get_batch(self, indices):
        import numpy as np

        out = self._frames[np.asarray(indices, int)]
        return types.SimpleNamespace(asnumpy=lambda: out)


def _build_functional_transforms(tfm):
    """Faithful PIL-backed torchvision.transforms stand-ins — the exact
    semantics the reference ImageDataset val path uses (data.py:92-99:
    Resize bicubic -> ToTensor -> Normalize(0.5, 1)).  torchvision's Resize
    on a PIL input is literally PIL Image.resize with the interpolation enum
    mapped to the PIL resample code (the stub enums ARE the PIL codes)."""
    import numpy as np
    from PIL import Image as PILImage

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, interpolation=2, **kw):
            self.size = size if isinstance(size, (tuple, list)) else (size, size)
            self.interpolation = int(interpolation)

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), resample=self.interpolation)

    class CenterCrop:
        def __init__(self, size):
            self.size = size if isinstance(size, (tuple, list)) else (size, size)

        def __call__(self, img):
            w, h = img.size
            th, tw = self.size
            left, top = (w - tw) // 2, (h - th) // 2
            return img.crop((left, top, left + tw, top + th))

    class RandomCrop:
        def __init__(self, size):
            self.size = size if isinstance(size, (tuple, list)) else (size, size)

        def __call__(self, img):
            import random as _random

            w, h = img.size
            th, tw = self.size
            top = _random.randint(0, h - th) if h > th else 0
            left = _random.randint(0, w - tw) if w > tw else 0
            return img.crop((left, top, left + tw, top + th))

    class ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, img):
            arr = np.asarray(img, np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))

    class Normalize:
        def __init__(self, mean, std, **kw):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class RandomHorizontalFlip:
        def __init__(self, *a, **k):
            pass

        def __call__(self, img):
            return img

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    for cls in (Compose, Resize, CenterCrop, RandomCrop, ToTensor,
                Normalize, RandomHorizontalFlip, Lambda):
        setattr(tfm, cls.__name__, cls)


def install_data_stubs() -> None:
    """Extra stubs so the reference DATA layer imports AND its image/video
    val pipelines RUN (data.py pulls in decord, torchvision transforms/io/
    VideoClips, ftfy, imagenet_stubs, and timm.data).  The transforms and
    decord.VideoReader stubs are FUNCTIONAL (PIL / cv2 backed) so the
    end-to-end eval parity tests can drive the reference's actual dataset
    classes; VideoClips/tvio stay import-only."""
    install_stubs()
    if "decord" in sys.modules:
        return
    dec = _mk_module("decord")
    dec.VideoReader = _CvVideoReader
    dec.cpu = lambda *a: None
    dec.bridge = types.SimpleNamespace(set_bridge=lambda *a, **k: None)

    import torchvision

    tfm = _mk_module("torchvision.transforms")
    tfm.__path__ = []
    _build_functional_transforms(tfm)
    tfm.InterpolationMode = types.SimpleNamespace(BICUBIC=3, BILINEAR=2)
    torchvision.transforms = tfm
    tff = _mk_module("torchvision.transforms.functional")
    for fn in ("pad", "resize", "center_crop", "normalize", "hflip", "crop"):
        setattr(tff, fn, lambda *a, **k: None)
    tff.InterpolationMode = tfm.InterpolationMode
    tfm.functional = tff
    dsm = _mk_module("torchvision.datasets")
    vu = _mk_module("torchvision.datasets.video_utils")
    vu.VideoClips = type("VideoClips", (), {})
    dsm.video_utils = vu
    torchvision.datasets = dsm
    tio = _mk_module("torchvision.io")
    tio.read_video = lambda *a, **k: None
    torchvision.io = tio

    ftfy = _mk_module("ftfy")
    ftfy.fix_text = lambda s, **k: s
    ist = _mk_module("imagenet_stubs")
    ist.__path__ = []
    lab = _mk_module("imagenet_stubs.imagenet_2012_labels")
    lab.label_to_name = lambda i: str(i)
    ist.imagenet_2012_labels = lab

    timm = sys.modules["timm"]
    timm.__path__ = []
    tdata = _mk_module("timm.data")
    tdata.__path__ = []
    ttr = _mk_module("timm.data.transforms")
    ttr._pil_interp = lambda name: 3
    tdata.transforms = ttr
    timm.data = tdata


@functools.lru_cache(maxsize=None)
def ref_module(name: str):
    """Import a reference submodule, e.g. ref_module('omnitokenizer')."""
    install_stubs()
    return importlib.import_module(f"OmniTokenizer.{name}")


@functools.lru_cache(maxsize=None)
def ref_pytorch_fid_inception():
    """Import the vendored pytorch-fid InceptionV3 module
    (/root/reference/evaluation/pytorch-fid/src/pytorch_fid/inception.py)
    against the torchvision stub."""
    install_stubs()
    path = f"{REFERENCE_ROOT}/evaluation/pytorch-fid/src"
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module("pytorch_fid.inception")


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


def convert_ref_lpips_params(ref_lpips):
    """Reference LPIPS module (stub-VGG backbone + its shipped lin weights)
    -> our flax LPIPS params tree (same mapping as
    tests/test_reference_parity_eval.py::test_lpips_forward_parity)."""
    import jax
    import numpy as np

    from omnitokenizer_tpu.models.lpips import load_lpips_variables

    sd = {k: v.detach().numpy() for k, v in ref_lpips.state_dict().items()}
    variables, _ = load_lpips_variables()
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))

    conv_keys = [k for k in sd if k.startswith("net.slice") and k.endswith(".weight")]

    def slice_order(k):
        _, sl, idx, _ = k.split(".")
        return (int(sl.replace("slice", "")), int(idx))

    conv_keys.sort(key=slice_order)
    net = dict(params["net"])
    flax_convs = sorted((k for k in net if k.startswith("conv")),
                        key=lambda s: int(s[4:]))
    assert len(conv_keys) == len(flax_convs)
    for tk, fk in zip(conv_keys, flax_convs):
        net[fk] = dict(net[fk])
        net[fk]["kernel"] = np.transpose(sd[tk], (2, 3, 1, 0))
        net[fk]["bias"] = sd[tk.replace(".weight", ".bias")]
    params["net"] = net
    for i in range(5):
        params[f"lin{i}"] = sd[f"lin{i}.model.1.weight"].reshape(-1)
    return params


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
