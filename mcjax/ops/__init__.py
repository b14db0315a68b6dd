from mcjax.ops import cells, pallas_sweep, sweep

__all__ = ["cells", "pallas_sweep", "sweep"]
