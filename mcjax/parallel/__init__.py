from mcjax.parallel import cluster, ensemble, mesh, npt

__all__ = ["cluster", "ensemble", "mesh", "npt"]
