"""Convert gym_recorder.cpp binary traces -> tests/golden/gym_*.npz.

Each npz holds (R = rows, P = players):
  meta         scalars: num_players, obs_size, max_players, team_size,
               spawn_opponents; teams [P]
  is_reset     [R]    1.0 on post-reset snapshot rows
  done         [R]
  action_idx   [R, P]
  parsed       [R, P, 8]
  ball / ball_inv          [R, 9]  (pos, vel, ang_vel)
  car_phys / car_phys_inv  [R, P, 18]  (pos3, fwd3, right3, up3 -> 12? no:
               pos3 + forward3 + right3 + up3 + vel3 + ang_vel3 = 18)
  flags        [R, P, 7]  (boost_fraction, is_on_ground, has_flip, has_jump,
               is_demoed, ball_touched_step, ball_touched_tick)
  counters     [R, P, 8]  (goals, saves, assists, shots, shot_passes, bumps,
               demos, boost_pickups)
  pads / pads_inv / pad_timers / pad_timers_inv  [R, 34]
  score_line   [R, 2]
  obs          [R, P, obs_size]   reference DefaultOBS(Padded) outputs
  rewards      [R, P]             reference reward outputs

gym_action_table.bin -> gym_action_table.npz {table [90, 8]}.
"""

import os
import struct
import sys

import numpy as np

MAGIC = 0x524D5947
TABLE_MAGIC = 0x54434147


def convert(path, out_dir):
    with open(path, "rb") as f:
        data = f.read()
    magic, version, rows, P, obs_size, max_players, team_size, spawn_opp = \
        struct.unpack_from("<8i", data, 0)
    assert magic == MAGIC and version == 1, path
    teams = np.frombuffer(data, "<i4", P, 32)
    off = 32 + 4 * P

    row_floats = 2 + P + 8 * P + 18 + 51 * P + 136 + 2 + P * obs_size + P
    body = np.frombuffer(data, "<f4", rows * row_floats, off)
    body = body.reshape(rows, row_floats)
    assert off + body.nbytes == len(data), path

    c = 0

    def take(n):
        nonlocal c
        out = body[:, c:c + n]
        c += n
        return out

    is_reset = take(1)[:, 0]
    done = take(1)[:, 0]
    action_idx = take(P).astype(np.int32)
    parsed = take(8 * P).reshape(rows, P, 8)
    ball = take(9)
    ball_inv = take(9)
    per_player = take(51 * P).reshape(rows, P, 51)
    car_phys = per_player[:, :, 0:18]
    car_phys_inv = per_player[:, :, 18:36]
    flags = per_player[:, :, 36:43]
    counters = per_player[:, :, 43:51]
    pads = take(34)
    pads_inv = take(34)
    pad_timers = take(34)
    pad_timers_inv = take(34)
    score_line = take(2)
    obs = take(P * obs_size).reshape(rows, P, obs_size)
    rewards = take(P)
    assert c == row_floats

    name = os.path.splitext(os.path.basename(path))[0]
    out = os.path.join(out_dir, name + ".npz")
    np.savez_compressed(
        out,
        num_players=P, obs_size=obs_size, max_players=max_players,
        team_size=team_size, spawn_opponents=spawn_opp, teams=teams,
        is_reset=is_reset, done=done, action_idx=action_idx, parsed=parsed,
        ball=ball, ball_inv=ball_inv,
        car_phys=car_phys, car_phys_inv=car_phys_inv,
        flags=flags, counters=counters,
        pads=pads, pads_inv=pads_inv,
        pad_timers=pad_timers, pad_timers_inv=pad_timers_inv,
        score_line=score_line, obs=obs, rewards=rewards)
    ev = counters[-1].sum(0)  # cumulative events in final row, all players
    print(f"{name}: rows={rows} P={P} obs={obs_size} "
          f"resets={int(is_reset.sum())} dones={int(done.sum())} "
          f"final-counters goals={ev[0]:.0f} saves={ev[1]:.0f} "
          f"assists={ev[2]:.0f} shots={ev[3]:.0f} bumps={ev[5]:.0f} "
          f"demos={ev[6]:.0f} touches={flags[:, :, 5].sum():.0f}")
    return out


def convert_table(path, out_dir):
    with open(path, "rb") as f:
        data = f.read()
    magic, version, count = struct.unpack_from("<3i", data, 0)
    assert magic == TABLE_MAGIC and version == 1 and count == 90
    table = np.frombuffer(data, "<f4", count * 8, 12).reshape(count, 8)
    out = os.path.join(out_dir, "gym_action_table.npz")
    np.savez_compressed(out, table=table)
    print(f"gym_action_table: {count} actions")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "traces"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "../../tests/golden"
    convert_table(os.path.join(src, "gym_action_table.bin"), out_dir)
    for fn in sorted(os.listdir(src)):
        if fn.startswith("gym_") and fn.endswith(".bin") \
                and fn != "gym_action_table.bin":
            convert(os.path.join(src, fn), out_dir)


if __name__ == "__main__":
    main()
