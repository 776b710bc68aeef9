"""Convert recorder.cpp binary traces -> tests/golden/*.npz.

Each npz holds:
  controls [R, C, 8]  (throttle, steer, pitch, yaw, roll, jump, boost, handbrake)
  car      [R, C, 38] (see CAR_FIELDS below; order matches recorder.cpp)
  ball     [R, 9]     (pos, vel, ang_vel)
Row 0 is the initial state (controls zeroed); row t>0 is the state after the
reference engine's tick t with controls[t] applied.
"""

import os
import struct
import sys

import numpy as np

# (name, width) in recorder write order
CAR_FIELDS = [
    ("pos", 3), ("forward", 3), ("right", 3), ("up", 3),
    ("vel", 3), ("ang_vel", 3),
    ("is_on_ground", 1),
    ("has_jumped", 1), ("has_double_jumped", 1), ("has_flipped", 1),
    ("flip_rel_torque", 3),
    ("jump_time", 1), ("flip_time", 1),
    ("is_flipping", 1), ("is_jumping", 1),
    ("air_time", 1), ("air_time_since_jump", 1),
    ("boost", 1), ("time_spent_boosting", 1),
    ("is_supersonic", 1), ("supersonic_time", 1),
    ("handbrake_val", 1),
    ("is_auto_flipping", 1), ("auto_flip_timer", 1),
]
CAR_WIDTH = sum(w for _, w in CAR_FIELDS)           # 38
CTRL_WIDTH = 8

assert CAR_WIDTH == 38


def car_field_slices():
    out, off = {}, 0
    for name, w in CAR_FIELDS:
        out[name] = slice(off, off + w)
        off += w
    return out


def convert(bin_path, npz_path):
    with open(bin_path, "rb") as f:
        magic, version, rows, cars, car_floats, ball_floats = struct.unpack(
            "<6i", f.read(24))
        assert magic == 0x47545243 and version == 1, bin_path
        assert car_floats == CTRL_WIDTH + CAR_WIDTH and ball_floats == 9
        data = np.frombuffer(f.read(), dtype="<f4")
    row_w = cars * car_floats + ball_floats
    assert data.size == rows * row_w, (bin_path, data.size, rows, row_w)
    data = data.reshape(rows, row_w)
    car_block = data[:, :cars * car_floats].reshape(rows, cars, car_floats)
    np.savez_compressed(
        npz_path,
        controls=car_block[:, :, :CTRL_WIDTH],
        car=car_block[:, :, CTRL_WIDTH:],
        ball=data[:, cars * car_floats:],
    )


def main(trace_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for fn in sorted(os.listdir(trace_dir)):
        if fn.endswith(".bin"):
            convert(os.path.join(trace_dir, fn),
                    os.path.join(out_dir, fn[:-4] + ".npz"))
            print("converted", fn)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "traces",
         sys.argv[2] if len(sys.argv) > 2 else
         os.path.join(os.path.dirname(__file__), "../../tests/golden"))
