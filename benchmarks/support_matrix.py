"""Regenerate the PARITY.md feature x engine/solver support matrix.

The matrix itself is computed by ``varanneal_tpu.support`` from the
REAL support predicates on concretely built problem variants (so the
table cannot drift from the code), and every cell is pinned by
``tests/test_support_matrix.py``. This script just prints the markdown.

Usage: PYTHONPATH=. python benchmarks/support_matrix.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from varanneal_tpu.support import markdown_table  # noqa: E402

if __name__ == "__main__":
    print(markdown_table())
