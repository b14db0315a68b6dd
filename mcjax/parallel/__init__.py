from mcjax.parallel import ensemble, mesh

__all__ = ["ensemble", "mesh"]
