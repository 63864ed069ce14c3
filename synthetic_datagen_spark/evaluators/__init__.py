from .distribution import DistributionEvaluator, spectral_distance
from .composite import composite_score, DEFAULT_WEIGHTS
from .tolerance import tolerance_panel
from .predictive import PredictiveEvaluator, augmentation_metrics
from .external_eval import ExternalPredictorEvaluator

__all__ = [
    "DistributionEvaluator",
    "spectral_distance",
    "composite_score",
    "DEFAULT_WEIGHTS",
    "tolerance_panel",
    "PredictiveEvaluator",
    "augmentation_metrics",
    "ExternalPredictorEvaluator",
]
