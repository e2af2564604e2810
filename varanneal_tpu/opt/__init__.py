"""Device-side optimizers."""

from varanneal_tpu.opt.lbfgs import lbfgs_minimize, LBFGSOptions, LBFGSResult

__all__ = ["lbfgs_minimize", "LBFGSOptions", "LBFGSResult"]
