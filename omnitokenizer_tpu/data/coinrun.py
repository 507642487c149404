"""CoinRun synthetic-game subsystem: JSON level traces -> rendered video
frames (+ semantic maps) -> dataset clips.

Reference: /root/reference/OmniTokenizer/coinrun/ — game.py (Game/Frame/
Agent/Monster state), construct_from_json.py (PIL paste renderer),
coinrun_data.py (datasets).  This is a re-design, not a port: rendering is
numpy alpha-compositing (single allocation per frame, no per-pixel PIL
loops), and all game constants live in one table.

Assets (kenney sprite sheets) are user-provided via `asset_root`; they ship
with the upstream repo and are plain image data.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# maze symbols (construct_from_json.py:17-31)
SPACE, LADDER = ".", "="
LAVA_SURFACE, LAVA_MIDDLE = "^", "|"
WALL_SURFACE, WALL_MIDDLE = "S", "A"
WALL_CLIFF_LEFT, WALL_CLIFF_RIGHT = "a", "b"
COIN1, COIN2 = "1", "2"
CRATES = "#$&%"

DEATH_ANIM_LENGTH = 30
MONSTER_DEATH_ANIM_LENGTH = 3

_ZOOM_DY_RATIO = {5.5: 5.0, 4.3: 6.5, 5.0: 5.5, 6.0: 4.5}


# ---------------------------------------------------------------------------
# game state (game.py semantics)
# ---------------------------------------------------------------------------

class Agent:
    def __init__(self, x, y, vx=0.0, vy=0.0, time_alive=0, ladder=False,
                 spring=0, is_killed=False, killed_animation_frame_cnt=0,
                 power_up_mode=False, **kw):
        self.x, self.y, self.vx, self.vy = x, y, vx, vy
        self.time_alive = time_alive
        self.ladder = ladder
        self.spring = spring
        self.is_killed = is_killed
        self.killed_animation_frame_cnt = killed_animation_frame_cnt
        self.power_up_mode = power_up_mode
        self.is_facing_right = vx >= 0
        self.walk1_mode = (time_alive // 5) % 2 == 0
        self.pose = self._pose()

    def _pose(self) -> str:
        if self.is_killed:
            return "hit"
        if self.ladder:
            return "climb1" if self.walk1_mode else "climb2"
        if self.vy != 0:
            return "jump"
        if self.spring != 0:
            return "duck"
        if self.vx == 0:
            return "stand"
        return "walk1" if self.walk1_mode else "walk2"


class Monster:
    def __init__(self, m_id, x, y, vx=0.0, vy=0.0, theme=0, is_jumping=False,
                 is_dead=False, time=0, anim_freq=1,
                 monster_dying_frame_cnt=0, **kw):
        self.m_id, self.x, self.y, self.vx, self.vy = m_id, x, y, vx, vy
        self.theme = theme
        self.is_dead = is_dead
        self.monster_dying_frame_cnt = monster_dying_frame_cnt
        if is_jumping:
            self.walk1_mode = vy == 0
        else:
            self.walk1_mode = (time // max(anim_freq, 1)) % 2 == 0


class Frame:
    def __init__(self, frame_id=-1, file_name="", state_time=0,
                 coins_eaten=None, agent=None, monsters=None, **kw):
        self.frame_id = frame_id
        self.file_name = file_name
        self.state_time = state_time
        self.coins_eaten = coins_eaten or []
        self.agent = Agent(**agent) if agent else None
        self.monsters = [Monster(**m) for m in (monsters or [])]


class Game:
    def __init__(self, **kw):
        self.zoom = 5.5
        self.bgzoom = 0.4
        self.video_res = 1024
        self.maze_w, self.maze_h = 64, 13
        self.world_theme_n = -1
        self.agent_theme_n = -1
        self.background_themes: List[str] = []
        self.ground_themes: List[str] = []
        self.agent_themes: List[str] = []
        self.monster_names: Dict[str, List[str]] = {}
        self.maze = None
        self.frames: List[Frame] = []
        self.__dict__.update(kw)
        self.frames = [f if isinstance(f, Frame) else Frame(**f) for f in self.frames]
        self.flattened_monster_names: List[str] = []
        if self.monster_names:
            self._flatten_monsters()

    @classmethod
    def from_json(cls, path: str) -> "Game":
        with open(path) as f:
            g = cls(**json.load(f))
        g._reset_eaten_coins()
        return g

    def _flatten_monsters(self):
        mn = self.monster_names
        self.flattened_monster_names = list(mn.get("ground", [])) + \
            list(mn.get("walking", [])) + list(mn.get("flying", []))

    def _reset_eaten_coins(self):
        # put back coins eaten within the clip (game.py:92-99)
        if not self.frames or self.maze is None:
            return
        for cx, cy in self.frames[-1].coins_eaten:
            if self.maze[cy][cx] == SPACE:
                self.maze[cy] = self.maze[cy][:cx] + COIN1 + self.maze[cy][cx + 1:]


# ---------------------------------------------------------------------------
# asset handling (numpy RGBA sprites)
# ---------------------------------------------------------------------------

def asset_paths(game: Game) -> Dict[str, object]:
    """construct_from_json.py:115-208 path scheme."""
    bg = game.background_themes[game.world_theme_n]
    gt = game.ground_themes[game.world_theme_n]
    walls = f"kenney/Ground/{gt}/{gt.lower()}"
    at = game.agent_themes[game.agent_theme_n]
    alien = f"kenneyLarge/Players/128x256_no_helmet/{at}/alien{at}"
    tiles, items, enemy = "kenney/Tiles/", "kenneyLarge/Items/", "kenneyLarge/Enemies/"
    world = {
        WALL_MIDDLE: walls + "Center.png", WALL_SURFACE: walls + "Mid.png",
        WALL_CLIFF_LEFT: walls + "Cliff_left.png",
        WALL_CLIFF_RIGHT: walls + "Cliff_right.png",
        COIN1: items + "coinGold.png", COIN2: items + "gemRed.png",
        "#": tiles + "boxCrate.png", "$": tiles + "boxCrate_double.png",
        "&": tiles + "boxCrate_single.png", "%": tiles + "boxCrate_warning.png",
        LAVA_MIDDLE: tiles + "lava.png", LAVA_SURFACE: tiles + "lavaTop_low.png",
        LADDER: tiles + "ladderMid.png",
    }
    poses = ["walk1", "walk2", "climb1", "climb2", "stand", "jump", "duck", "hit"]
    return dict(background=bg, world=world,
                alien={p: f"{alien}_{p}.png" for p in poses},
                monster={n: enemy + n + ".png"
                         for n in game.flattened_monster_names})


class AssetBank:
    """Loads + resizes sprites once; returns numpy RGBA arrays."""

    def __init__(self, game: Game, asset_root: str, kx: float, ky: float):
        from PIL import Image

        self.root = asset_root
        self.kx, self.ky = kx, ky
        self.sprites: Dict[str, np.ndarray] = {}
        paths = asset_paths(game)

        def load(rel, size):
            p = os.path.join(asset_root, rel)
            if not os.path.isfile(p):  # pose fallback: strip _pose suffix
                base, ext = os.path.splitext(p)
                p = "_".join(base.split("_")[:-1]) + ext
            img = Image.open(p).convert("RGBA").resize(size)
            return np.asarray(img, np.uint8)

        for key, rel in paths["world"].items():
            self.sprites[key] = load(rel, (math.ceil(kx + 0.5), math.ceil(ky + 0.5)))
        for pose, rel in paths["alien"].items():
            spr = load(rel, (math.ceil(kx), math.ceil(2 * ky)))
            self.sprites[f"alien_{pose}"] = spr
            self.sprites[f"alien_{pose}_left"] = spr[:, ::-1]
        for name, rel in paths["monster"].items():
            for pose, suffix in (("", ""), ("_move", "_move"), ("_dead", "_dead")):
                base, ext = os.path.splitext(rel)
                spr = load(base + suffix + ext, (math.ceil(kx), math.ceil(ky)))
                self.sprites[name + pose] = spr
                self.sprites[name + pose + "_right"] = spr[:, ::-1]
        bgsize = math.ceil(game.video_res * game.zoom)
        self.background = load(paths["background"], (bgsize, bgsize))[..., :3]


def _blit(canvas: np.ndarray, sprite: np.ndarray, x: int, y: int,
          w: Optional[int] = None, h: Optional[int] = None):
    """Alpha-composite sprite onto canvas at (x, y), optional resize."""
    if w is not None and (sprite.shape[1] != w or sprite.shape[0] != h):
        from PIL import Image

        if w <= 0 or h <= 0:
            return
        sprite = np.asarray(
            Image.fromarray(sprite).resize((w, h), Image.NEAREST), np.uint8)
    sh, sw = sprite.shape[:2]
    H, W = canvas.shape[:2]
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + sw, W), min(y + sh, H)
    if x1 <= x0 or y1 <= y0:
        return
    tile = sprite[y0 - y:y1 - y, x0 - x:x1 - x]
    alpha = tile[..., 3:4].astype(np.float32) / 255.0
    region = canvas[y0:y1, x0:x1]
    canvas[y0:y1, x0:x1] = (tile[..., :3].astype(np.float32) * alpha
                            + region.astype(np.float32) * (1 - alpha)).astype(np.uint8)


def draw_game_frame(game: Game, frame_id: int, bank: AssetBank,
                    kx: float, ky: float) -> np.ndarray:
    """Render one RGB frame (video_res^2) — the gen_original=True path of
    construct_from_json.py:461-696 (camera math preserved)."""
    res = game.video_res
    canvas = np.zeros((res, res, 3), np.uint8)
    center = (res - 1) // 2
    fr = game.frames[frame_id]

    dx = -fr.agent.x * kx + center - 0.5 * kx
    dy = -center + _ZOOM_DY_RATIO[game.zoom] * ky

    # tiled background with bg parallax zoom
    zx = res * game.zoom
    for tx in range(-1, 3):
        for ty in range(-1, 2):
            bx = zx * tx + center + game.bgzoom * (dx + kx * game.maze_h / 2) - zx * 0.5
            by = zx * ty + center + game.bgzoom * (dy - ky * game.maze_h / 2) - zx * 0.5
            bg = np.dstack([bank.background,
                            np.full(bank.background.shape[:2], 255, np.uint8)])
            _blit(canvas, bg, int(bx), int(by))

    # world tiles around the agent
    radius = int(1 + game.maze_w / game.zoom)
    ix, iy = int(fr.agent.x + 0.5), int(fr.agent.y + 0.5)
    eaten = {tuple(c) for c in fr.coins_eaten}
    for y in range(max(iy - radius, 0), min(iy + radius + 1, game.maze_h)):
        for x in range(max(ix - radius, 0), min(ix + radius + 1, game.maze_w)):
            wkey = game.maze[y][x]
            if wkey == SPACE or (x, y) in eaten:
                continue
            px = math.floor(kx * x + dx)
            py = math.floor(res - ky * y + dy)
            _blit(canvas, bank.sprites[wkey], px, py)

    # monsters
    for m in fr.monsters:
        name = game.flattened_monster_names[m.theme]
        pose = "_dead" if m.is_dead else ("" if m.walk1_mode else "_move")
        key = name + pose + ("_right" if m.vx > 0 else "")
        h = math.ceil(ky)
        y_off = 0.0
        if m.is_dead:
            shrink = (MONSTER_DEATH_ANIM_LENGTH - max(0, m.monster_dying_frame_cnt)) \
                * 0.8 / MONSTER_DEATH_ANIM_LENGTH
            h = math.ceil(ky * (1 - shrink))
            y_off = ky * shrink
        _blit(canvas, bank.sprites[key],
              math.floor(kx * m.x + dx), math.floor(res - ky * m.y + dy + y_off),
              math.ceil(kx), h)

    # agent (drawn last, optional death fade)
    a = fr.agent
    key = f"alien_{a.pose}" + ("" if a.is_facing_right else "_left")
    sprite = bank.sprites[key]
    if a.is_killed:
        transparency = (DEATH_ANIM_LENGTH + 1 - a.killed_animation_frame_cnt) * 12
        if transparency > 255:
            sprite = None
        else:
            sprite = sprite.copy()
            sprite[..., 3] = np.clip(
                sprite[..., 3].astype(np.int16) - transparency, 0, 255).astype(np.uint8)
    if sprite is not None:
        _blit(canvas, sprite,
              math.floor(kx * a.x + dx), math.floor(res - ky * (a.y + 1) + dy))
    return canvas


# ---------------------------------------------------------------------------
# dataset (coinrun_data.py semantics)
# ---------------------------------------------------------------------------

class CoinRunDataset:
    """Renders `sequence_length`-frame clips from JSON level traces.

    Each annotation is a game JSON (game.py asdict format).  Frames render at
    `resolution` directly (video_res overridden) in [-0.5, 0.5] channels-last.
    """

    def __init__(self, data_folder: str, asset_root: str,
                 sequence_length: int = 17, resolution: int = 256,
                 train: bool = True, seed: int = 1234,
                 get_text_desc: bool = False, text_seq_len: int = 256,
                 truncate_captions: bool = True, text_path: str = None):
        self.asset_root = asset_root
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.rng = np.random.RandomState(seed)
        self.files = sorted(
            os.path.join(r, n) for r, _, fs in os.walk(data_folder)
            for n in fs if n.endswith(".json"))
        self._banks: Dict[str, AssetBank] = {}

        # text conditioning (reference CoinRunDataset get_text_desc=True,
        # coinrun_data.py:103,373-411): manual annotations from text_path
        # when present for a clip, auto-captions over the sampled frame
        # window otherwise; emitted as CLIP-BPE ids padded to text_seq_len.
        self.get_text_desc = get_text_desc
        self.text_seq_len = text_seq_len
        self.truncate_captions = truncate_captions
        self.text_data = None
        self._tokenizer = None
        if get_text_desc:
            from .text_tokenizer import SimpleTokenizer
            self._tokenizer = SimpleTokenizer()
            if text_path:
                import json as _json
                with open(text_path) as f:
                    self.text_data = _json.load(f)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        game = Game.from_json(self.files[idx])
        game.video_res = self.resolution
        kx = game.zoom * self.resolution / game.maze_w
        ky = kx
        bank_key = f"{game.world_theme_n}/{game.agent_theme_n}/{self.resolution}"
        if bank_key not in self._banks:
            self._banks[bank_key] = AssetBank(game, self.asset_root, kx, ky)
        bank = self._banks[bank_key]

        n = len(game.frames)
        seq = min(self.sequence_length, n)
        start = self.rng.randint(0, n - seq + 1)
        frames = np.stack([
            draw_game_frame(game, start + i, bank, kx, ky) for i in range(seq)])
        if seq < self.sequence_length:
            pad = np.zeros((self.sequence_length - seq,) + frames.shape[1:], np.uint8)
            frames = np.concatenate([frames, pad])
        video = frames.astype(np.float32) / 255.0 - 0.5
        out = {"video": video, "label": -1, "path": self.files[idx]}
        if self.get_text_desc:
            key = os.path.splitext(os.path.basename(self.files[idx]))[0]
            if self.text_data is not None and key in self.text_data:
                caps = self.text_data[key]
                cap = caps[0] if len(caps) == 1 else caps[self.rng.randint(len(caps))]
            else:
                from .coinrun_text import describe_clip
                cap = describe_clip(game, start, start + seq)
            out["text"] = np.asarray(
                self._tokenizer.tokenize(cap, self.text_seq_len,
                                         self.truncate_captions), np.int64)
        return out
