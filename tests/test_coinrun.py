"""CoinRun subsystem test: synthesize a game JSON and render a clip with the
reference's shipped assets (read-only data)."""

import json
import os

import numpy as np
import pytest

ASSET_ROOT = "/root/reference/OmniTokenizer/coinrun/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSET_ROOT), reason="coinrun assets unavailable")


def make_game_json(path):
    maze_h, maze_w = 13, 64
    maze = ["." * maze_w for _ in range(maze_h)]
    maze[0] = "S" * maze_w          # ground row (y=0 is bottom)
    maze[1] = "." * 10 + "1" + "." * 20 + "=" + "." * 32  # a coin + ladder

    frames = []
    for i in range(6):
        frames.append({
            "frame_id": i,
            "file_name": f"f{i}.png",
            "state_time": i,
            "coins_eaten": [],
            "agent": {"x": 5.0 + 0.3 * i, "y": 1.0, "vx": 0.3, "vy": 0.0,
                      "time_alive": i},
            "monsters": [{"m_id": 0, "x": 8.0, "y": 1.0, "vx": -0.1,
                          "vy": 0.0, "theme": 0, "time": i, "anim_freq": 1}],
        })

    game = {
        "game_id": 0, "level_seed": 1, "rl_agent_seed": 2,
        "zoom": 5.5, "bgzoom": 0.4,
        "world_theme_n": 0, "agent_theme_n": 0,
        "background_themes": ["backgrounds/background-2/airadventurelevel4.png"],
        "ground_themes": ["Planet"],
        "agent_themes": ["Yellow"],
        "monster_names": {"ground": ["bee"], "walking": [], "flying": []},
        "video_res": 64, "maze_w": maze_w, "maze_h": maze_h,
        "maze": maze, "frames": frames,
    }
    with open(path, "w") as f:
        json.dump(game, f)


def test_game_state_parsing(tmp_path):
    from omnitokenizer_tpu.data.coinrun import Game

    p = str(tmp_path / "g0.json")
    make_game_json(p)
    g = Game.from_json(p)
    assert len(g.frames) == 6
    assert g.frames[0].agent.pose in ("walk1", "walk2", "stand")
    assert g.flattened_monster_names == ["bee"]
    # facing follows vx sign
    assert g.frames[0].agent.is_facing_right
    assert not g.frames[0].monsters[0].vx > 0


def test_render_clip(tmp_path):
    from omnitokenizer_tpu.data.coinrun import CoinRunDataset

    make_game_json(str(tmp_path / "g0.json"))
    ds = CoinRunDataset(str(tmp_path), ASSET_ROOT, sequence_length=4,
                        resolution=64)
    assert len(ds) == 1
    s = ds[0]
    assert s["video"].shape == (4, 64, 64, 3)
    v = s["video"]
    assert v.min() >= -0.5 and v.max() <= 0.5
    # frames are not empty (background + tiles rendered)
    assert float(np.abs(v + 0.5).mean()) > 0.05
    # consecutive frames differ (agent moves)
    assert float(np.abs(v[0] - v[3]).max()) > 0.01


def test_text_tokenizer_roundtrip():
    from omnitokenizer_tpu.data.text_tokenizer import SimpleTokenizer

    tk = SimpleTokenizer()
    assert tk.vocab_size == 49408  # matches lm_transformer.py:125 text vocab
    text = "mugen jumps over a snail and collects a coin !"
    ids = tk.encode(text)
    assert tk.decode(ids) == text
    padded = tk("hello world", context_length=12)
    assert len(padded) == 12 and padded[0] == tk.encoder["<|startoftext|>"]


def test_describe_clip(tmp_path):
    from omnitokenizer_tpu.data.coinrun import Game
    from omnitokenizer_tpu.data.coinrun_text import describe_clip

    p = str(tmp_path / "g.json")
    make_game_json(p)
    g = Game.from_json(p)
    desc = describe_clip(g)
    assert desc.startswith("Mugen ")
    assert "right" in desc  # agent vx > 0 across frames


def test_dataset_emits_text_tokens(tmp_path):
    """CoinRunDataset(get_text_desc=True) == reference coinrun_data.py:103,
    373-411: auto-caption over the sampled window unless a manual annotation
    exists for the clip id; ids are [sot]+bpe+[eot] zero-padded."""
    import json as _json

    from omnitokenizer_tpu.data.coinrun import CoinRunDataset
    from omnitokenizer_tpu.data.text_tokenizer import SimpleTokenizer

    data_dir = tmp_path / "jsons"
    data_dir.mkdir()
    make_game_json(str(data_dir / "g0.json"))
    make_game_json(str(data_dir / "g1.json"))

    ds = CoinRunDataset(str(data_dir), ASSET_ROOT, sequence_length=4,
                        resolution=64, get_text_desc=True, text_seq_len=32)
    s = ds[0]
    tk = SimpleTokenizer()
    assert s["text"].shape == (32,) and s["text"].dtype == np.int64
    assert s["text"][0] == tk.encoder["<|startoftext|>"]
    decoded = tk.decode([t for t in s["text"]
                         if t not in (0, tk.encoder["<|startoftext|>"],
                                      tk.encoder["<|endoftext|>"])])
    assert decoded.startswith("mugen")  # auto-caption (BPE lowercases)

    # manual annotation wins when present for the clip id (text_path lives
    # OUTSIDE the data folder, like the reference's --text_path)
    (tmp_path / "caps.json").write_text(
        _json.dumps({"g0": ["mugen does a custom thing"]}))
    ds2 = CoinRunDataset(str(data_dir), ASSET_ROOT, sequence_length=4,
                         resolution=64, get_text_desc=True, text_seq_len=32,
                         text_path=str(tmp_path / "caps.json"))
    t0 = ds2[0]["text"]
    want = np.zeros(32, np.int64)
    ids = tk.tokenize("mugen does a custom thing", 32)
    np.testing.assert_array_equal(t0, np.asarray(ids))
    # g1 has no manual caption -> auto-caption path still used
    assert ds2[1]["text"][0] == tk.encoder["<|startoftext|>"]
    assert want.shape == t0.shape


@pytest.mark.slow
def test_transformer_train_coinrun_text_cond(tmp_path):
    """CLI-driven LM train smoke with coinrun text conditioning (VERDICT r3
    item 7): CoinRunDataset(get_text_desc=True) captions -> BPE ids ->
    Net2Net 'text' cond column, 2 steps through cli/transformer_train."""
    from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig
    from omnitokenizer_tpu.cli import transformer_train
    from omnitokenizer_tpu.utils.checkpoint import save_tokenizer_checkpoint

    data_dir = tmp_path / "coinrun_jsons"
    data_dir.mkdir()
    for i in range(8):
        make_game_json(str(data_dir / f"g{i}.json"))

    tok_cfg = TokenizerConfig(
        embedding_dim=16, n_codes=32, codebook_dim=4, resolution=64,
        sequence_length=5, patch_size=16, temporal_patch_size=2,
        enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
        dim_head=8, heads=2, spatial_pos="rope")
    tok = OmniTokenizerVQGAN.from_config(tok_cfg, seed=0)
    save_tokenizer_checkpoint(str(tmp_path / "tok.msgpack"), tok.variables,
                              cfg=tok_cfg)

    run_dir = str(tmp_path / "run")
    transformer_train.main([
        "--vqvae", str(tmp_path / "tok.msgpack"),
        "--data_path", str(data_dir),
        "--train_datalist", "unused", "--val_datalist", "unused",
        "--asset_root", ASSET_ROOT,
        "--default_root_dir", run_dir,
        "--resolution", "64", "--sequence_length", "5",
        "--batch_size", "8", "--num_workers", "0",
        "--text_cond", "--cond_stage_key", "text", "--text_seq_len", "8",
        "--class_cond_dim", "49408", "--starts_with_sos",
        "--block_size", "64", "--n_layer", "1", "--n_head", "2",
        "--n_embd", "16",
        "--lr", "1e-4", "--warmup_steps", "1", "--max_steps", "2",
    ])
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        recs = [_l for _l in f if _l.strip()]
    assert len(recs) >= 2
    last = json.loads(recs[-1])
    assert np.isfinite(last["loss"])
