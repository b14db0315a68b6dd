from mcjax.ops import cells, cluster, pallas_sweep, sweep

__all__ = ["cells", "cluster", "pallas_sweep", "sweep"]
