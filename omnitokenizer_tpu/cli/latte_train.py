"""Latte (video diffusion) training CLI — analogue of
/root/reference/Diffusion/Latte/train.py; shares the recipe with dit_train
(AdamW 1e-4, EMA 0.9999, uniform timesteps) on video latents
(B, 1+(T-1)//4, 32, 32, 8)."""

from .dit_train import build_parser as _bp, main as _main


def build_parser():
    return _bp(video=True)


def main(argv=None):
    return _main(argv, video=True)


if __name__ == "__main__":
    main()
