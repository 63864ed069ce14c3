from .features import regime_features
from .garch import fit_garch_grid
from .model import RegimeModel
from .generate import RegimeGenerator
from .regime_gan import RegimeGanModel, RegimeGanTrainer, load_regime_gan, save_regime_gan
from .regime_gan import generate as regime_gan_generate

__all__ = [
    "regime_features",
    "fit_garch_grid",
    "RegimeModel",
    "RegimeGenerator",
    "RegimeGanModel",
    "RegimeGanTrainer",
    "regime_gan_generate",
    "save_regime_gan",
    "load_regime_gan",
]
