from mcjax.utils import io, observables

__all__ = ["io", "observables"]
