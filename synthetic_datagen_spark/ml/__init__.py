"""Deep-generator surface (SURVEY §2.10 G1-G3/G10/G11, §2.11 M1-M4).

Spark owns the dataflow: training-window preparation (S2→W1→W3) and
batched decoder inference (broadcast model → mapInPandas). The gradient
loops themselves are driver-side TF/torch in the reference and neither
framework ships in this container — trainer classes are explicit stubs
that document the contract, while `LinearDecoder` provides a
deterministic stand-in model so the full generate path (G1 latent
sampling → G2 decode → G3 window reconstruction) is real and tested.
"""

from .prep import prepare_training_windows
from .decoder import LinearDecoder, VaeGanTrainer, TimeGanTrainer

__all__ = [
    "prepare_training_windows",
    "LinearDecoder",
    "VaeGanTrainer",
    "TimeGanTrainer",
]
