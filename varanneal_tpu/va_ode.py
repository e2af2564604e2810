"""Reference-compatible module alias: ``varanneal.va_ode`` → here.

The reference packages the ODE Annealer as ``varanneal/va_ode.py ::
Annealer`` and user scripts import it as ``from varanneal import
va_ode``. This alias lets those scripts switch by changing only the
package name::

    from varanneal_tpu import va_ode
    anneal = va_ode.Annealer()

The class is :class:`varanneal_tpu.api.Annealer` — the full facade
(``set_model`` / ``set_data`` / ``set_data_fromfile`` / ``anneal`` /
``save_paths`` / ``save_params`` / ``save_action_errors``) with the
reference's kwarg surface (``adolcID`` accepted and ignored: XLA
compilation replaces the per-process ADOL-C tape).
"""

from varanneal_tpu.api import Annealer  # noqa: F401

__all__ = ["Annealer"]
