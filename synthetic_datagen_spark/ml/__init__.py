"""Deep-generator surface (SURVEY §2.10 G1-G3/G10/G11, §2.11 M1-M4).

Spark owns the dataflow: training-window preparation (S2→W1→W3) and
batched decoder inference (broadcast model → mapInPandas). M1/M2 train
for real — a numpy-SGD linear VAE (ml/vae.py) with an optional
adversarial discriminator, consuming a bounded deterministic window
sample on the driver exactly like the reference's driver-side Keras
loops. M4 (TimeGAN) is the numpy 3-phase protocol in timegan.py;
`LinearDecoder`
provides its deterministic inference stand-in so the full generate path
(G1 latent sampling → G2 decode → G3 window reconstruction) is real
and tested either way.
"""

from .prep import prepare_training_windows
from .decoder import (
    GanTrainer,
    LinearDecoder,
    LinearVaeTrainer,
    MlpDecoder,
    TimeGanTrainer,
    VaeGanTrainer,
)
from .gan import LinearGan, MlpGan
from .vae import LinearVae, MlpVae

__all__ = [
    "prepare_training_windows",
    "GanTrainer",
    "LinearDecoder",
    "LinearGan",
    "LinearVae",
    "LinearVaeTrainer",
    "MlpDecoder",
    "MlpGan",
    "MlpVae",
    "VaeGanTrainer",
    "TimeGanTrainer",
]
