from muygpys_tpu.gp.multivariate_muygps import MultivariateMuyGPS
from muygpys_tpu.gp.muygps import MuyGPS

__all__ = ["MultivariateMuyGPS", "MuyGPS"]
