from mcjax.parallel import cluster, ensemble, gcmc, mesh, npt

__all__ = ["cluster", "ensemble", "gcmc", "mesh", "npt"]
