"""Production serving: trained model -> high-throughput posterior endpoint.

Wraps the pieces a serving process needs — KNN index, distance assembly in
the lane-friendly batch-last layout, and the fused solvers — behind one
object.  Engines:

- ``"lanes"`` (default): the batch-last XLA pipeline
  (:mod:`muygpys_tpu.ops.lanes_solver`) — ~4M preds/sec/chip, compiles in
  seconds.
- ``"pallas"``: the fully fused VMEM kernel
  (:mod:`muygpys_tpu.pallas.fused_predict`) — ~48M preds/sec/chip measured,
  requires Matern nu in {1/2, 3/2, 5/2, inf} and a long first compile.
- ``"reference"``: the generic standard-layout path (for debugging).

The query batch is padded to a fixed bucket size so ONE compiled program
serves any request size (XLA static shapes).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from muygpys_tpu.gp.deformation import Isotropy
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.gp.noise import HomoscedasticNoise
from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.ops import kernels as _k
from muygpys_tpu.ops.lanes_solver import serve_mean_and_variance_bl

_CLOSED_FORM_NU = {0.5, 1.5, 2.5, math.inf}


class FastServer:
    """Batched posterior-serving endpoint for a trained MuyGPS model.

    Args:
        muygps: trained model (Matern/RBF + Isotropy + homoscedastic noise).
        nbrs_lookup: KNN index over the training features.
        train_features / train_targets: the training set (univariate or
            multivariate targets).
        bucket: compiled request size; queries are padded up to it.
        engine: ``"lanes"`` | ``"pallas"`` | ``"reference"``.
    """

    def __init__(
        self,
        muygps: MuyGPS,
        nbrs_lookup: NN_Wrapper,
        train_features,
        train_targets,
        bucket: int = 4096,
        engine: str = "lanes",
    ):
        if not isinstance(muygps.kernel, (Matern, RBF)):
            raise ValueError(
                f"FastServer supports Matern/RBF, not {type(muygps.kernel)}"
            )
        if not isinstance(muygps.kernel.deformation, Isotropy):
            raise ValueError("FastServer requires an isotropic deformation")
        if not isinstance(muygps.noise, HomoscedasticNoise):
            raise ValueError("FastServer requires homoscedastic noise")
        if engine not in ("lanes", "pallas", "reference"):
            raise ValueError(f"unknown engine {engine!r}")

        self.muygps = muygps
        self.nbrs = nbrs_lookup
        self.bucket = bucket
        self.engine = engine
        self._train = jnp.asarray(np.atleast_2d(np.asarray(train_features)))
        if self._train.shape[0] == 1 and np.asarray(train_features).ndim == 1:
            self._train = self._train.T
        targets = np.asarray(train_targets)
        if targets.ndim == 1:
            targets = targets[:, None]
        self._targets = jnp.asarray(targets)
        self._response_count = targets.shape[1]

        self._ls = float(muygps.kernel.deformation.length_scale())
        self._noise = float(muygps.noise())
        self._scale = float(np.asarray(muygps.scale()).reshape(-1)[0])
        if isinstance(muygps.kernel, RBF):
            self._nu = math.inf
            self._is_rbf = True
        else:
            self._nu = float(muygps.kernel.smoothness())
            self._is_rbf = False
        if engine == "pallas":
            if self._is_rbf or self._nu not in (0.5, 1.5, 2.5, math.inf):
                raise ValueError(
                    "pallas engine supports Matern nu in "
                    "{0.5, 1.5, 2.5, inf}"
                )

        self._predict_fn = self._build()

    # -- assembly + predict program (compiled once per bucket) --

    def _kernel_eval(self, dists):
        metric = self.muygps.kernel.deformation.metric
        d = metric.apply_length_scale(dists, self._ls)
        if self._is_rbf:
            return _k.rbf_fn(d)
        if self._nu == 0.5:
            return _k.matern_05_fn(d)
        if self._nu == 1.5:
            return _k.matern_15_fn(d)
        if self._nu == 2.5:
            return _k.matern_25_fn(d)
        if self._nu == math.inf:
            return _k.matern_inf_fn(d)
        return _k.matern_gen_fn(d, self._nu)

    def _build(self):
        metric = self.muygps.kernel.deformation.metric
        train = self._train
        targets = self._targets
        noise = self._noise
        scale = self._scale
        nn_count = self.nbrs.nn_count

        def assemble_bl(queries, nn_idx):
            # batch-last distance assembly straight from gathers
            nf = train[nn_idx]  # (B, n, f)
            q = queries  # (B, f)
            d2p = jnp.maximum(
                jnp.sum(nf * nf, -1)[:, :, None]
                + jnp.sum(nf * nf, -1)[:, None, :]
                - 2.0
                * jnp.einsum(
                    "bif,bjf->bij", nf, nf,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                0.0,
            )
            d2c = jnp.maximum(
                jnp.sum(q * q, -1)[:, None]
                + jnp.sum(nf * nf, -1)
                - 2.0
                * jnp.einsum(
                    "bf,bnf->bn", q, nf,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                0.0,
            )
            if metric._differences_metric_fn.__name__ == "l2":
                from muygpys_tpu.ops.tensors import safe_sqrt

                dp, dc = safe_sqrt(d2p), safe_sqrt(d2c)
            else:
                dp, dc = d2p, d2c
            y = targets[nn_idx]  # (B, n, r)
            return (
                jnp.transpose(dp, (1, 2, 0)),
                jnp.transpose(dc, (1, 0)),
                jnp.transpose(y, (1, 2, 0)),
            )

        if self.engine == "pallas":
            from muygpys_tpu.pallas.fused_predict import fused_predict_bl

            tile = int(math.gcd(self.bucket, 512))

            nu = self._nu

            @jax.jit
            def predict(queries, nn_idx):
                pw, cw, y = assemble_bl(queries, nn_idx)
                mean, var = fused_predict_bl(
                    pw, cw, y, self._ls, noise, smoothness=nu,
                    batch_tile=tile,
                )
                return mean.T, scale * var  # (B, r), (B,)

        elif self.engine == "lanes":

            @jax.jit
            def predict(queries, nn_idx):
                pw, cw, y = assemble_bl(queries, nn_idx)
                eye = jnp.eye(nn_count, dtype=pw.dtype)[:, :, None]
                Kin = self._kernel_eval(pw) + noise * eye
                Kcross = self._kernel_eval(cw)
                mean, var = serve_mean_and_variance_bl(
                    Kin, Kcross, jnp.asarray(1.0, pw.dtype), y
                )
                return mean.T, scale * var  # (B, r), (B,)

        else:  # reference engine

            @jax.jit
            def predict(queries, nn_idx):
                crosswise, pairwise, nn_targets = (
                    self.muygps.make_predict_tensors(
                        jnp.arange(queries.shape[0]), nn_idx, queries,
                        train, targets,
                    )
                )
                Kin = self.muygps.kernel(pairwise)
                Kcross = self.muygps.kernel(crosswise)
                return self.muygps.posterior_mean_and_variance(
                    Kin, Kcross, nn_targets
                )

        return predict

    def predict(self, test_features) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (mean, variance) for a batch of queries (any size)."""
        test = np.atleast_2d(np.asarray(test_features))
        if np.asarray(test_features).ndim == 1:
            test = np.asarray(test_features)[:, None]
        count = test.shape[0]
        nn_idx, _ = self.nbrs.get_nns(test)

        means, variances = [], []
        for start in range(0, count, self.bucket):
            chunk = test[start : start + self.bucket]
            idx = np.asarray(nn_idx)[start : start + self.bucket]
            pad = self.bucket - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)), mode="edge")
                idx = np.pad(idx, ((0, pad), (0, 0)), mode="edge")
            m, v = self._predict_fn(jnp.asarray(chunk), jnp.asarray(idx))
            means.append(np.asarray(m))
            variances.append(np.asarray(v))
        mean = np.concatenate(means)[:count]
        var = np.concatenate(variances)[:count]
        return mean, var
