from .block_bootstrap import BlockBootstrapGenerator
from .grasynda import GrasyndaGenerator
from .seeds import derive_seed, seed_col

__all__ = ["BlockBootstrapGenerator", "GrasyndaGenerator", "derive_seed", "seed_col"]
