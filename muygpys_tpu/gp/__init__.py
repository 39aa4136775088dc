from muygpys_tpu.gp.muygps import MuyGPS

__all__ = ["MuyGPS"]
