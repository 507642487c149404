"""Native FFmpeg decoder (native/video_decode.cc) vs the imageio fallback.

The native path is the decord analogue (reference video_utils.py:15,206-332):
libavformat demux + libavcodec decode + libswscale convert/resize, driven by
a probe-then-window-decode contract so only the sampled frames pay the
color-convert/resize half.
"""

from __future__ import annotations

import numpy as np
import pytest

from omnitokenizer_tpu.native import build as nb

pytestmark = pytest.mark.skipif(
    not nb.video_available(), reason="native video decoder not built")


def _write_gif(path, frames, fps=10):
    import imageio

    imageio.mimsave(str(path), list(frames), format="GIF",
                    duration=int(1000 / fps), loop=0)


@pytest.fixture()
def gif_clip(tmp_path):
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 255, (11, 40, 48, 3), np.uint8)
    p = tmp_path / "clip.gif"
    _write_gif(p, frames)
    return str(p), frames


def test_probe_exact_metadata(gif_clip):
    path, frames = gif_clip
    n, fps, w, h = nb.probe_video(path)
    assert n == len(frames)
    assert (w, h) == (48, 40)
    assert fps > 0


def test_full_decode_bit_exact_vs_imageio(gif_clip):
    import imageio.v3 as iio

    path, _ = gif_clip
    n, _, w, h = nb.probe_video(path)
    dec = nb.decode_video_window(path, 0, n, w, h)
    ref = np.asarray(iio.imread(path))[..., :3]
    np.testing.assert_array_equal(dec, ref)


def test_window_decode_matches_full(gif_clip):
    path, _ = gif_clip
    n, _, w, h = nb.probe_video(path)
    full = nb.decode_video_window(path, 0, n, w, h)
    win = nb.decode_video_window(path, 4, 5, w, h)
    np.testing.assert_array_equal(win, full[4:9])


def test_short_decode_raises(gif_clip):
    path, _ = gif_clip
    n, _, w, h = nb.probe_video(path)
    with pytest.raises(RuntimeError, match="short decode"):
        nb.decode_video_window(path, n - 2, 5, w, h)


def test_probe_missing_file():
    with pytest.raises(RuntimeError, match="ov_probe failed"):
        nb.probe_video("/nonexistent/clip.mp4")


def test_load_video_frames_backend_parity(gif_clip):
    """At native resolution (no resize), both backends must return identical
    frames and masks for the deterministic 'center' strategy."""
    from omnitokenizer_tpu.data.video import load_video_frames

    path, _ = gif_clip
    nat, mnat = load_video_frames(path, 7, "center", -1, height=40, width=48,
                                  backend="native")
    ref, mref = load_video_frames(path, 7, "center", -1, height=40, width=48,
                                  backend="imageio")
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(mnat, mref)


def test_load_video_frames_rand_same_rng_same_window(gif_clip):
    from omnitokenizer_tpu.data.video import load_video_frames

    path, _ = gif_clip
    nat, _ = load_video_frames(path, 5, "rand", -1, height=40, width=48,
                               rng=np.random.RandomState(3), backend="native")
    ref, _ = load_video_frames(path, 5, "rand", -1, height=40, width=48,
                               rng=np.random.RandomState(3), backend="imageio")
    np.testing.assert_array_equal(nat, ref)


def test_native_resize_close_to_pil(tmp_path):
    """swscale-bilinear vs PIL-bilinear: not bit-identical (different tap
    windows on downscale), but close on smooth content (the reference's
    decord resize is also swscale under the hood)."""
    from omnitokenizer_tpu.data.video import load_video_frames

    yy, xx = np.mgrid[0:40, 0:48].astype(np.float32)
    grad = np.stack([yy * 6, xx * 5, (yy + xx) * 3], -1).clip(0, 255)
    frames = np.repeat(grad[None].astype(np.uint8), 6, axis=0)
    path = tmp_path / "grad.gif"
    _write_gif(path, frames)

    nat, _ = load_video_frames(str(path), 5, "center", -1, height=20,
                               width=24, backend="native")
    ref, _ = load_video_frames(str(path), 5, "center", -1, height=20,
                               width=24, backend="imageio")
    assert nat.shape == ref.shape == (5, 20, 24, 3)
    diff = np.abs(nat.astype(int) - ref.astype(int))
    assert diff.mean() < 3.0, diff.mean()


def test_pad_mask_short_clip(tmp_path):
    from omnitokenizer_tpu.data.video import load_video_frames

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (3, 16, 16, 3), np.uint8)
    p = tmp_path / "short.gif"
    _write_gif(p, frames)
    out, mask = load_video_frames(str(p), 6, "center", -1, height=16,
                                  width=16, backend="native")
    assert out.shape == (6, 16, 16, 3)
    np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0, 0])
    assert (out[3:] == 0).all()


def test_videodataset_uses_native_backend(tmp_path):
    """End-to-end: VideoDataset items decode through the native path when
    available (auto backend) and batches are finite and in [-0.5, 0.5]."""
    from omnitokenizer_tpu.data.video import VideoDataset

    rng = np.random.RandomState(0)
    (tmp_path / "train").mkdir()
    for i in range(2):
        clip = rng.randint(0, 255, (8, 24, 24, 3), np.uint8)
        _write_gif(tmp_path / "train" / f"c{i}.gif", clip)

    ds = VideoDataset(str(tmp_path), sequence_length=5, resolution=24,
                      train=True)
    item = ds[0]
    assert item["video"].shape == (5, 24, 24, 3)
    assert item["video"].min() >= -0.5 and item["video"].max() <= 0.5


def _write_mp4(path, frames, fps=10):
    import cv2

    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


@pytest.fixture()
def mp4_clip(tmp_path):
    # smooth gradient content: mp4v is lossy, random noise would stress
    # nothing but the quantizer
    t, h, w = 12, 48, 64
    y, x = np.mgrid[0:h, 0:w]
    frames = np.stack([
        np.stack([(x * 2 + i * 7) % 256, (y * 3 + i * 5) % 256,
                  ((x + y) + i * 11) % 256], -1).astype(np.uint8)
        for i in range(t)])
    p = tmp_path / "clip.mp4"
    _write_mp4(p, frames)
    return str(p), frames


def test_mp4_probe_and_decode(mp4_clip):
    """The native decoder handles real mp4 bitstreams (training data is
    mp4, not GIF): probe metadata + full-decode parity vs cv2's decoder of
    the same file (same bitstream; codecs may differ by rounding)."""
    import cv2

    path, frames = mp4_clip
    n, fps, w, h = nb.probe_video(path)
    assert n == len(frames)
    assert (h, w) == frames.shape[1:3]

    got = nb.decode_video_window(path, 0, len(frames), w, h)
    assert got.shape == frames.shape

    cap = cv2.VideoCapture(path)
    ref = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    ref = np.stack(ref)
    assert ref.shape == got.shape
    # same libavcodec family decodes the same bitstream: allow only
    # color-convert rounding differences
    assert np.mean(np.abs(got.astype(np.int16) - ref.astype(np.int16))) < 2.0
    assert np.percentile(np.abs(got.astype(np.int16) - ref.astype(np.int16)), 99) <= 4


def test_mp4_window_decode(mp4_clip):
    path, frames = mp4_clip
    n, _, w, h = nb.probe_video(path)
    full = nb.decode_video_window(path, 0, n, w, h)
    win = nb.decode_video_window(path, 4, 6, w, h)
    np.testing.assert_array_equal(win, full[4:10])
