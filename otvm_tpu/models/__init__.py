from .stm import STM  # noqa: F401
from .fba import FBA  # noqa: F401
from .memory import MemoryBank  # noqa: F401
