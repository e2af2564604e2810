"""Precision-annealing ladder."""

from varanneal_tpu.anneal.ladder import run_ladder, LadderResult
from varanneal_tpu.anneal.checkpoint import run_ladder_checkpointed

__all__ = ["run_ladder", "LadderResult", "run_ladder_checkpointed"]
