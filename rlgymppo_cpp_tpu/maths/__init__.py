from rlgymppo_cpp_tpu.maths.vec import (
    dot, cross, norm, norm_sq, norm2d, norm_sq2d, normalized, safe_normalized,
    clamp_norm,
)
from rlgymppo_cpp_tpu.maths.rot import (
    euler_to_rotmat, rotmat_to_euler, forward_vec_from_angle, angle_from_vec,
    wrap_normalize, round_angle_ue3, rotmat_identity, look_at_rotmat,
)
from rlgymppo_cpp_tpu.maths.curves import LinearPieceCurve
