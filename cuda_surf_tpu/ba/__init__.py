from .core import BAProblem, BAState, project, residuals, cost, run_lm, lm_step
from .distributed import make_distributed_lm, shard_problem

__all__ = [
    "BAProblem", "BAState", "project", "residuals", "cost", "run_lm",
    "lm_step", "make_distributed_lm", "shard_problem",
]
