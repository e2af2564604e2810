"""Pure-function numerics: problem spec, discretization residuals, action."""

from varanneal_tpu.ops.spec import ProblemSpec, build_spec, DISC_NAMES
from varanneal_tpu.ops.disc import model_residuals
from varanneal_tpu.ops.action import (
    make_action, measurement_error, model_error, unpack, pack,
)

__all__ = [
    "ProblemSpec", "build_spec", "model_residuals", "DISC_NAMES",
    "make_action", "measurement_error", "model_error", "unpack", "pack",
]
