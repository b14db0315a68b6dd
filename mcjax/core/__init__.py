from mcjax.core.config import SimConfig
from mcjax.core.state import SimState, init_state

__all__ = ["SimConfig", "SimState", "init_state"]
