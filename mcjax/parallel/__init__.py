from mcjax.parallel import cluster, ensemble, gcmc, mesh, npt, semigrand

__all__ = ["cluster", "ensemble", "gcmc", "mesh", "npt", "semigrand"]
