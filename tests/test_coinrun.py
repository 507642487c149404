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
