"""Car hitbox/wheel presets.

Data port of RocketSim src/Sim/Car/CarConfig/CarConfig.{h,cpp} (hitbox sizes
chosen to reproduce real RL inertia tensors, per the reference's comments).
"""

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class WheelPairConfig:
    wheel_radius: float
    suspension_rest_length: float
    # Suspension connection point; +Y is mirrored for the left wheel.
    connection_point_offset: tuple


@dataclasses.dataclass(frozen=True)
class CarConfig:
    hitbox_size: tuple       # full size, not half extents
    hitbox_pos_offset: tuple  # does not affect center of mass
    front_wheels: WheelPairConfig
    back_wheels: WheelPairConfig
    dodge_deadzone: float = 0.5

    def wheel_arrays(self):
        """Per-wheel static arrays, order [FL?, FR?, BL?, BR?] matching the
        reference's wheel order (i<2 front, i%2 left; Car.cpp:243-264).

        Returns dict of np arrays keyed by:
          connection [4,3], radius [4], rest_len [4] (already reduced by
          MAX_SUSPENSION_TRAVEL like Car.cpp:258), force_scale [4].
        """
        from rlgymppo_cpp_tpu.sim.constants import BTVehicle

        conn, radius, rest = [], [], []
        for i in range(4):
            front = i < 2
            left = i % 2 == 1
            pair = self.front_wheels if front else self.back_wheels
            off = np.array(pair.connection_point_offset, dtype=np.float32)
            if left:
                off = off * np.array([1, -1, 1], dtype=np.float32)
            conn.append(off)
            radius.append(pair.wheel_radius)
            rest.append(pair.suspension_rest_length - BTVehicle.MAX_SUSPENSION_TRAVEL)
        force_scale = np.array(
            [BTVehicle.SUSPENSION_FORCE_SCALE_FRONT] * 2
            + [BTVehicle.SUSPENSION_FORCE_SCALE_BACK] * 2,
            dtype=np.float32,
        )
        return {
            "connection": np.stack(conn),
            "radius": np.array(radius, dtype=np.float32),
            "rest_len": np.array(rest, dtype=np.float32),
            "force_scale": force_scale,
        }


def _mk(hitbox, offset, fw_rad, fw_rest, fw_off, bw_rad, bw_rest, bw_off):
    return CarConfig(
        hitbox_size=hitbox,
        hitbox_pos_offset=offset,
        front_wheels=WheelPairConfig(fw_rad, fw_rest, fw_off),
        back_wheels=WheelPairConfig(bw_rad, bw_rest, bw_off),
    )


# CarConfig.cpp:20-70
CAR_CONFIG_OCTANE = _mk(
    (120.507, 86.6994, 38.6591), (13.87566, 0.0, 20.755),
    12.50, 38.755, (51.25, 25.90, 20.755),
    15.00, 37.055, (-33.75, 29.50, 20.755))

CAR_CONFIG_DOMINUS = _mk(
    (130.427, 85.7799, 33.8), (9.0, 0.0, 15.75),
    12.00, 33.95, (50.30, 31.10, 15.75),
    13.50, 33.85, (-34.75, 33.00, 15.75))

CAR_CONFIG_PLANK = _mk(  # batmobile preset
    (131.32, 87.1704, 31.8944), (9.00857, 0.0, 12.0942),
    12.50, 31.9242, (49.97, 27.80, 12.0942),
    17.00, 27.9242, (-35.43, 20.28, 12.0942))

CAR_CONFIG_BREAKOUT = _mk(
    (133.992, 83.021, 32.8), (12.5, 0.0, 11.75),
    13.50, 29.7, (51.50, 26.67, 11.75),
    15.00, 29.666, (-35.75, 35.00, 11.75))

CAR_CONFIG_HYBRID = _mk(
    (129.519, 84.6879, 36.6591), (13.8757, 0.0, 20.755),
    12.50, 38.755, (51.25, 25.90, 20.755),
    15.00, 37.055, (-34.00, 29.50, 20.755))

CAR_CONFIG_MERC = _mk(
    (123.22, 79.2103, 44.1591), (11.3757, 0.0, 21.505),
    15.00, 39.505, (51.25, 25.90, 21.505),
    15.00, 39.105, (-33.75, 29.50, 21.505))


def bullet_effective_half_extents(hitbox_size):
    """Effective collision/inertia half extents of the car hitbox, in UU.

    bullet's btBoxShape stores `implicit = half - margin` at construction
    with the default convex margin 0.04 m, then setSafeMargin may SHRINK
    the margin to 0.1 * min(half) (btBoxShape.cpp:17-26,
    btConvexInternalShape.h:63-78 in the vendored bullet3-3.24). Both the
    collision surface and calculateLocalInertia use
    `implicit + final_margin`, so the effective box is

        half_bt - 0.04 + min(0.04, 0.1 * min(half_bt))

    i.e. ~0.067 UU SMALLER than the configured hitbox per half extent for
    Octane (and exactly the configured size for Merc, whose min half
    extent exceeds 0.4 m). Verified against the compiled reference's
    runtime getInvInertiaDiagLocal() (tools/golden/probe_powerslide.cpp):
    a naive half+0.04m box is ~9% off on inverse inertia, which showed up
    as the powerslide/drive_steer side-impulse drift.
    """
    half_bt = np.asarray(hitbox_size, np.float64) / 2.0 / 50.0
    margin = min(0.04, 0.1 * float(half_bt.min()))
    return np.asarray((half_bt - 0.04 + margin) * 50.0, np.float32)
