"""Observation builders (vectorized DefaultOBS / DefaultOBSPadded).

Same layout as the reference (RLGymSim_CPP src/RLGymSim_CPP/Utils/
OBSBuilders/DefaultOBS.cpp:20-56): ball(9) + prev action(8) + pads(34) +
self(19) + teammates(19 each) + opponents(19 each), with the whole state
rotated 180 degrees ("inverted") for orange players so both teams always
attack +Y. 1v1 obs size = 89.

DefaultOBSPadded additionally pads slots up to `max_players` per team and
shuffles teammate/opponent slot order every call to kill slot bias
(DefaultOBSPadded.cpp:41-59).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym import common_values as CV
from rlgymppo_cpp_tpu.gym.gamestate import GameState, invert_vec, invert_rot

PLAYER_OBS_SIZE = 19


class DefaultOBS:
    def __init__(self, pos_coef=None, vel_coef=None, ang_vel_coef=None):
        self.pos_coef = jnp.asarray(
            pos_coef if pos_coef is not None
            else [1 / CV.SIDE_WALL_X, 1 / CV.BACK_WALL_Y, 1 / CV.CEILING_Z],
            jnp.float32)
        self.vel_coef = vel_coef if vel_coef is not None \
            else 1 / CV.CAR_MAX_SPEED
        self.ang_vel_coef = ang_vel_coef if ang_vel_coef is not None \
            else 1 / CV.CAR_MAX_ANG_VEL

    def obs_size(self, num_players):
        return 9 + 8 + CV.BOOST_LOCATIONS_AMOUNT \
            + PLAYER_OBS_SIZE * num_players

    def _player_units(self, gs: GameState):
        """Per-player 19-float blocks, normal and inverted views
        [N, P, 19] each (AddPlayerToOBS, DefaultOBS.cpp:3-18)."""
        def block(pos, rot, vel, ang_vel):
            return jnp.concatenate([
                pos * self.pos_coef,
                rot[..., :, 0],          # forward
                rot[..., :, 2],          # up
                vel * self.vel_coef,
                ang_vel * self.ang_vel_coef,
                gs.boost_fraction[..., None],
                gs.is_on_ground[..., None].astype(jnp.float32),
                gs.has_flip[..., None].astype(jnp.float32),
                gs.is_demoed[..., None].astype(jnp.float32),
            ], axis=-1)

        normal = block(gs.car_pos, gs.car_rot, gs.car_vel, gs.car_ang_vel)
        inv = block(invert_vec(gs.car_pos), invert_rot(gs.car_rot),
                    invert_vec(gs.car_vel), invert_vec(gs.car_ang_vel))
        return normal, inv

    def _ball_and_pads(self, gs: GameState):
        ball_n = jnp.concatenate([
            gs.ball_pos * self.pos_coef,
            gs.ball_vel * self.vel_coef,
            gs.ball_ang_vel * self.ang_vel_coef], axis=-1)
        ball_i = jnp.concatenate([
            invert_vec(gs.ball_pos) * self.pos_coef,
            invert_vec(gs.ball_vel) * self.vel_coef,
            invert_vec(gs.ball_ang_vel) * self.ang_vel_coef], axis=-1)
        pads_n = gs.pads_active.astype(jnp.float32)
        pads_i = pads_n[..., ::-1]  # inverted canonical order (GameState.cpp)
        return ball_n, ball_i, pads_n, pads_i

    def build(self, gs: GameState, prev_actions, teams, key=None):
        """-> [N, P, obs_size]. `prev_actions` is [N, P, 8]; `teams` is a
        static length-P int array."""
        P = len(teams)
        normal, inv = self._player_units(gs)
        ball_n, ball_i, pads_n, pads_i = self._ball_and_pads(gs)

        rows = []
        for p in range(P):
            is_orange = int(teams[p]) == 1
            units = inv if is_orange else normal
            ball = ball_i if is_orange else ball_n
            pads = pads_i if is_orange else pads_n
            mates = [q for q in range(P) if q != p and teams[q] == teams[p]]
            opps = [q for q in range(P) if teams[q] != teams[p]]
            parts = [ball, prev_actions[..., p, :], pads, units[..., p, :]]
            parts += [units[..., q, :] for q in mates]
            parts += [units[..., q, :] for q in opps]
            rows.append(jnp.concatenate(parts, axis=-1))
        return jnp.stack(rows, axis=-2)


class DefaultOBSPadded(DefaultOBS):
    """Supports mixed team sizes: teammate/opponent slots padded to
    `max_players` and shuffled per call (DefaultOBSPadded.cpp)."""

    def __init__(self, max_players, **kw):
        super().__init__(**kw)
        self.max_players = max_players

    def obs_size(self, num_players=None):
        return 9 + 8 + CV.BOOST_LOCATIONS_AMOUNT \
            + PLAYER_OBS_SIZE * 2 * self.max_players

    def build(self, gs: GameState, prev_actions, teams, key=None):
        P = len(teams)
        normal, inv = self._player_units(gs)
        ball_n, ball_i, pads_n, pads_i = self._ball_and_pads(gs)
        batch = gs.ball_pos.shape[:-1]

        rows = []
        for p in range(P):
            is_orange = int(teams[p]) == 1
            units = inv if is_orange else normal
            ball = ball_i if is_orange else ball_n
            pads = pads_i if is_orange else pads_n
            mates = [q for q in range(P) if q != p and teams[q] == teams[p]]
            opps = [q for q in range(P) if teams[q] != teams[p]]
            if len(mates) > self.max_players - 1 or len(opps) > self.max_players:
                raise ValueError("too many players for DefaultOBSPadded")

            def padded_group(idxs, count, subkey):
                blocks = [units[..., q, :] for q in idxs]
                blocks += [jnp.zeros((*batch, PLAYER_OBS_SIZE), jnp.float32)
                           ] * (count - len(idxs))
                group = jnp.stack(blocks, axis=-2)  # [N, count, 19]
                if subkey is not None and count > 1:
                    perm = jax.random.permutation(
                        subkey,
                        jnp.broadcast_to(jnp.arange(count), (*batch, count)),
                        axis=-1, independent=True)
                    group = jnp.take_along_axis(
                        group, perm[..., None], axis=-2)
                return group.reshape(*batch, count * PLAYER_OBS_SIZE)

            if key is not None:
                key, k1, k2 = jax.random.split(key, 3)
            else:
                k1 = k2 = None
            mates_blk = padded_group(mates, self.max_players - 1, k1)
            opps_blk = padded_group(opps, self.max_players, k2)
            rows.append(jnp.concatenate(
                [ball, prev_actions[..., p, :], pads, units[..., p, :],
                 mates_blk, opps_blk], axis=-1))
        return jnp.stack(rows, axis=-2)
