"""Named query catalog — importing this package registers every query."""

from .base import REGISTRY, QuerySpec, register  # noqa: F401

from . import agg_queries  # noqa: F401,E402
from . import distribution_queries  # noqa: F401,E402
from . import evaluator_queries  # noqa: F401,E402
from . import flagship  # noqa: F401,E402
from . import generator_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import regime_queries  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import scalar_queries  # noqa: F401,E402
from . import source_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import vector_queries  # noqa: F401,E402
from . import window_queries  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec", "register"]
