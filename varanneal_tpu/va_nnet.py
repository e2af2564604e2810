"""Reference-compatible module alias: ``varanneal.va_nnet`` → here.

The reference packages the feedforward-network Annealer as
``varanneal/va_nnet.py :: Annealer``; this alias mirrors that path::

    from varanneal_tpu import va_nnet
    ann = va_nnet.Annealer()

The class is :class:`varanneal_tpu.nnet.Annealer` (structure /
activation / input / output setters, ``anneal``, ``predict``, save
helpers mirroring the ODE facade).
"""

from varanneal_tpu.nnet import Annealer  # noqa: F401

__all__ = ["Annealer"]
