from mcjax.ops import cells, sweep

__all__ = ["cells", "sweep"]
