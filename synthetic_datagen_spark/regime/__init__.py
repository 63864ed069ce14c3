from .features import regime_features
from .garch import fit_garch_grid
from .model import RegimeModel
from .generate import RegimeGenerator

__all__ = ["regime_features", "fit_garch_grid", "RegimeModel", "RegimeGenerator"]
