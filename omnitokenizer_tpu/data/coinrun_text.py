"""Auto text descriptions for CoinRun clips.

Reference behaviour: /root/reference/OmniTokenizer/coinrun/generate_text_desc.py
— derive natural-language captions from the frame-state deltas (movement,
jumps, coin/gem collection, monster kills, deaths, power-ups).  This is a
compact re-design over the same Game/Frame state (data/coinrun.py).
"""

from __future__ import annotations

from typing import List

from .coinrun import Game


def describe_clip(game: Game, f_start: int = 0, f_end: int = -1,
                  agent_name: str = "Mugen") -> str:
    """One-sentence summary of what the agent does in [f_start, f_end)."""
    frames = game.frames[f_start:f_end if f_end > 0 else len(game.frames)]
    if not frames:
        return f"{agent_name} stands still."

    events: List[str] = []
    coins = 0
    gems = 0
    killed_monsters = 0
    died = False
    powered = False
    jumped = False
    climbed = False

    prev_eaten = len(frames[0].coins_eaten)
    for fr in frames:
        a = fr.agent
        if a is None:
            continue
        if a.pose == "jump":
            jumped = True
        if a.pose.startswith("climb"):
            climbed = True
        if a.is_killed:
            died = True
        if a.power_up_mode:
            powered = True
        new_eaten = len(fr.coins_eaten)
        if new_eaten > prev_eaten:
            coins += new_eaten - prev_eaten
        prev_eaten = new_eaten
        killed_monsters += sum(1 for m in fr.monsters
                               if m.is_dead and m.monster_dying_frame_cnt ==
                               max((mm.monster_dying_frame_cnt for mm in fr.monsters
                                    if mm.m_id == m.m_id), default=0))

    first, last = frames[0].agent, frames[-1].agent
    dx = (last.x - first.x) if (first and last) else 0.0
    if dx > 0.5:
        events.append("runs to the right")
    elif dx < -0.5:
        events.append("runs to the left")
    else:
        events.append("stays in place")
    if jumped:
        events.append("jumps")
    if climbed:
        events.append("climbs a ladder")
    if coins:
        events.append(f"collects {'a coin' if coins == 1 else f'{coins} coins'}")
    if powered:
        events.append("is in power-up mode")
    if any(m.is_dead for fr in frames for m in fr.monsters):
        events.append("kills a monster")
    if died:
        events.append("gets killed")

    if len(events) == 1:
        body = events[0]
    else:
        body = ", ".join(events[:-1]) + " and " + events[-1]
    return f"{agent_name} {body}."
