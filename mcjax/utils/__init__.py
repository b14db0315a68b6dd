from mcjax.utils import (debug, io, observables, profiling, reweight,
                         stats)

__all__ = ["debug", "io", "observables", "profiling", "reweight", "stats"]
