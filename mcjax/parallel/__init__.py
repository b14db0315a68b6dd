from mcjax.parallel import cluster, ensemble, mesh

__all__ = ["cluster", "ensemble", "mesh"]
