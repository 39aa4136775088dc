"""Native (C++) host-side components.

Currently: an in-tree HNSW approximate nearest neighbor index
(:mod:`muygpys_tpu.native.hnsw`), replacing the reference's external hnswlib
dependency.  The library is compiled on first use with g++ and cached next to
the source.
"""

from muygpys_tpu.native.hnsw import HNSW

__all__ = ["HNSW"]
