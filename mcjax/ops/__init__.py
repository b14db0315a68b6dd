from mcjax.ops import cells, cluster, ecmc, pallas_sweep, semigrand, sweep

__all__ = ["cells", "cluster", "ecmc", "pallas_sweep", "semigrand", "sweep"]
