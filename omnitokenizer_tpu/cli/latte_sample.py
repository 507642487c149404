"""Latte sampling CLI — analogue of
/root/reference/Diffusion/Latte/sample/sample_ddp.py (CFG on 4 channels,
decode via OmniTokenizer VAE :203)."""

from .dit_sample import build_parser as _bp, main as _main


def build_parser():
    return _bp(video=True)


def main(argv=None):
    return _main(argv, video=True)


if __name__ == "__main__":
    main()
