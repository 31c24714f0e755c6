from .aggregate import ResultAggregator, plot_hypopt, plot_pareto_front, plot_rd_curves
from .linear_eval import z_linear_eval
from .pretrained import PretrainedAnalyser

__all__ = ["ResultAggregator", "plot_hypopt", "plot_pareto_front",
           "plot_rd_curves", "z_linear_eval", "PretrainedAnalyser"]
