from rlgymppo_cpp_tpu.utils.report import Report
from rlgymppo_cpp_tpu.utils.timer import Timer
