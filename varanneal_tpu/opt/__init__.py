"""Device-side optimizers."""

from varanneal_tpu.opt.lbfgs import lbfgs_minimize, LBFGSOptions, LBFGSResult
from varanneal_tpu.opt.tnc import tnc_minimize, TNCOptions

__all__ = ["lbfgs_minimize", "LBFGSOptions", "LBFGSResult",
           "tnc_minimize", "TNCOptions"]
