from mcjax.utils import debug, io, observables, profiling

__all__ = ["debug", "io", "observables", "profiling"]
