from mcjax.ops import (cells, cluster, ecmc, extfield, pallas_sweep,
                       semigrand, sweep)

__all__ = ["cells", "cluster", "ecmc", "extfield", "pallas_sweep",
           "semigrand", "sweep"]
