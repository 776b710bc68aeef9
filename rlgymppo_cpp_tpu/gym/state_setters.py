"""State setters: batched episode-reset state generators.

Mirror of RLGymSim_CPP src/RLGymSim_CPP/Utils/StateSetters/*. A setter is
`reset(arena, state, key) -> ArenaState`; it may use the arena's kickoff
helper (the reference setters receive the Arena pointer for exactly this,
StateSetter.h:8-9).
"""

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import normalized
from rlgymppo_cpp_tpu.maths.rot import euler_to_rotmat
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.gym import common_values as CV


class KickoffState:
    """Arena::ResetToRandomKickoff (KickoffState.h:7-11)."""

    def reset(self, arena, state, key):
        return arena.reset_to_random_kickoff(state, key)


class RandomState:
    """Random ball/car placement (RandomState.cpp:8-62)."""

    X_MAX = 3500.0
    Y_MAX = 4000.0
    Z_MAX = 1820.0
    CAR_Z_MIN = 150.0

    def __init__(self, rand_ball_speed=True, rand_car_speed=True,
                 cars_on_ground=True):
        self.rand_ball_speed = rand_ball_speed
        self.rand_car_speed = rand_car_speed
        self.cars_on_ground = cars_on_ground

    def reset(self, arena, state, key):
        key, kk = jax.random.split(key)
        state = arena.reset_to_random_kickoff(state, kk)
        batch = state.batch_shape
        P = arena.num_players

        # Arena-aware spawn extents. The class constants are the
        # reference's soccar margins (RandomState.cpp:8-62); hoops'
        # arena is smaller (+-2967 x +-3581 x 1820 vs +-4096 x +-5120 x
        # 2048), so the soccar constants spawn ~25% of cars/balls inside
        # or beyond the walls — observed as a 20M-step hoops run whose
        # policy never moved off uniform (embedded entities feed the
        # batch symmetric junk rewards that drown the learning signal).
        # Scale each axis by the active arena's extent ratio.
        from rlgymppo_cpp_tpu.sim.arena import GameMode
        if arena.game_mode == GameMode.HOOPS:
            sx = C.ARENA_EXTENT_X_HOOPS / C.ARENA_EXTENT_X
            sy = C.ARENA_EXTENT_Y_HOOPS / C.ARENA_EXTENT_Y
            sz = C.ARENA_HEIGHT_HOOPS / C.ARENA_HEIGHT
        else:
            sx = sy = sz = 1.0
        x_max, y_max = self.X_MAX * sx, self.Y_MAX * sy
        z_max = self.Z_MAX * sz

        def rand_vec(k, shape, lo, hi):
            return jax.random.uniform(
                k, (*shape, 3), minval=jnp.asarray(lo, jnp.float32),
                maxval=jnp.asarray(hi, jnp.float32))

        def rand_norm_vec(k, shape):
            return normalized(rand_vec(k, shape, (-1, -1, -1), (1, 1, 1)))

        keys = jax.random.split(key, 12)

        # Ball
        bpos = rand_vec(keys[0], batch,
                        (-x_max, -y_max, CV.BALL_RADIUS),
                        (x_max, y_max, z_max))
        bvel = rand_norm_vec(keys[1], batch) * jax.random.uniform(
            keys[2], batch, minval=0.0, maxval=4000.0)[..., None]
        bang = rand_vec(keys[3], batch, (-4, -4, -4), (4, 4, 4))
        if not self.rand_ball_speed:
            bvel = jnp.zeros_like(bvel)
            bang = jnp.zeros_like(bang)
        ball = state.ball.replace(pos=bpos, vel=bvel, ang_vel=bang)

        # Cars
        shape = (*batch, P)
        cpos = rand_vec(keys[4], shape,
                        (-x_max, -y_max, self.CAR_Z_MIN),
                        (x_max, y_max, z_max))
        cvel = rand_norm_vec(keys[5], shape) * jax.random.uniform(
            keys[6], shape, minval=0.0, maxval=C.CAR_MAX_SPEED)[..., None]
        cang = rand_norm_vec(keys[7], shape) * 5.5
        if not self.rand_car_speed:
            cvel = jnp.zeros_like(cvel)
            cang = jnp.zeros_like(cang)
        yaw = jax.random.uniform(keys[8], shape, minval=-jnp.pi, maxval=jnp.pi)
        pitch = jax.random.uniform(keys[9], shape,
                                   minval=-jnp.pi / 2, maxval=jnp.pi / 2)
        roll = jax.random.uniform(keys[10], shape,
                                  minval=-jnp.pi, maxval=jnp.pi)

        if self.cars_on_ground:
            on_ground = jnp.ones(shape, bool)
        else:
            on_ground = jax.random.uniform(keys[11], shape) > 0.5
        cpos = cpos.at[..., 2].set(
            jnp.where(on_ground, 17.0, cpos[..., 2]))
        pitch = jnp.where(on_ground, 0.0, pitch)
        roll = jnp.where(on_ground, 0.0, roll)
        cvel = cvel.at[..., 2].set(jnp.where(on_ground, 0.0, cvel[..., 2]))
        cang = jnp.where(on_ground[..., None], 0.0, cang)

        boost = jax.random.uniform(keys[11], shape, minval=0.0, maxval=100.0)
        cars = state.cars.replace(
            pos=cpos, rot=euler_to_rotmat(yaw, pitch, roll),
            vel=cvel, ang_vel=cang, boost=boost,
        )
        return state.replace(ball=ball, cars=cars)
