"""Named query catalog — importing this package registers every query."""

from .base import REGISTRY, QuerySpec, register  # noqa: F401

# Registration order is rotated round-over-round so the correctness
# driver's first-50 sample accumulates hash coverage across the whole
# catalog (names never change, only order).  Round 6: the text / vector
# / window / source families (never driver-sampled in rounds 1-5) fill
# the 50-entry window exactly (18 + 7 + 17 + 8).
from . import text_queries  # noqa: F401,E402
from . import vector_queries  # noqa: F401,E402
from . import window_queries  # noqa: F401,E402
from . import source_queries  # noqa: F401,E402
from . import scalar_queries  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import agg_queries  # noqa: F401,E402
from . import distribution_queries  # noqa: F401,E402
from . import evaluator_queries  # noqa: F401,E402
from . import flagship  # noqa: F401,E402
from . import generator_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import regime_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "register"]
