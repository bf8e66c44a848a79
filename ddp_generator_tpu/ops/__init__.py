from .backpass import BackPassResult, back_pass
from .boxqp import BoxQPHyper, BoxQPResult, boxqp
from .forward import Rollout, cost_only, forward_pass
from .linesearch import LineSearchResult, line_search

__all__ = [
    "BackPassResult",
    "BoxQPHyper",
    "BoxQPResult",
    "LineSearchResult",
    "Rollout",
    "back_pass",
    "boxqp",
    "cost_only",
    "forward_pass",
    "line_search",
]
