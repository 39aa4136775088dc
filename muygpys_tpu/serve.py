"""Production serving: trained model -> high-throughput posterior endpoint.

Wraps the pieces a serving process needs — KNN index, distance assembly in
the lane-friendly batch-last layout, and the fused solvers — behind one
object.  Engines:

- ``"lanes"`` (default): the batch-last XLA pipeline
  (:mod:`muygpys_tpu.ops.lanes_solver`) — ~4M preds/sec/chip, compiles in
  seconds.
- ``"pallas"``: the fully fused coordinate-streaming VMEM kernel
  (:func:`muygpys_tpu.pallas.fused_predict.fused_predict_coords_bl`) —
  streams neighbor coordinates, computes distances in VMEM (~n/d x less HBM
  traffic than a distance-tensor kernel), and takes the trained
  hyperparameters as traced SMEM scalars so ONE cached executable serves
  every trained model of a given shape.  Any Matern smoothness nu in
  [0.05, 10] (closed forms for 1/2, 3/2, 5/2, inf; the certified
  :mod:`muygpys_tpu.pallas.matern_nu` surrogate otherwise — free/general
  smoothness models, the library's signature class, serve at full speed)
  and RBF.
- ``"fused"``: everything on device in ONE compiled program per bucket —
  Pallas KNN candidate kernel (:mod:`muygpys_tpu.pallas.knn`) over the
  training set, a single gather of a packed ``[features | targets
  (| noise)]`` table (TPU row gathers are expensive; one gather, not
  three), exact re-rank of the over-fetched candidates, then the coords
  solve kernel.  The KNN index passed in is used only for its
  ``nn_count``; queries never leave the device between KNN and posterior.
  Same model-class requirements as ``"pallas"``.  ~1M preds/sec/chip at
  50k training points (PERF.md r2).  Neighbor sets match the exact
  engines at ~0.9996; the residual boundary swaps move tail posteriors
  by <~1.5% of signal rms (measured) — use ``"pallas"`` with an exact
  ``NN_Wrapper`` when bit-faithful neighbor sets matter more than 2.7x
  throughput.
- ``"reference"``: the generic standard-layout path (for debugging).

Model classes served (reference capability parity, SURVEY §2.5/§2.7):
Isotropy or Anisotropy deformations (per-feature length scales), and
homoscedastic or heteroscedastic noise (pass the per-training-point
``measurement_noise`` vector; the per-neighborhood nugget is gathered at
query time exactly like the reference's ``_make_heteroscedastic_tensor``,
``_src/gp/tensors/numpy.py:11-15``).  The lensing shear family
(``ShearKernel`` 3-in/3-out, ``ShearKernel2in3out``, ``ShearNoise33``)
serves through the lanes engine's multi-output block solver — posterior
mean ``(B, 3)`` + full ``(B, 3, 3)`` covariance per query (r4; the
reference has no serving machinery for these models at all) — or, since
r5, through ``engine="pallas"``: the same chain with the (I*n, I*n)
block Cholesky fused into one VMEM Pallas pass per tile
(:mod:`muygpys_tpu.pallas.multiout_solve`).

The query batch is padded to a fixed bucket size so ONE compiled program
serves any request size (XLA static shapes).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from muygpys_tpu.gp.deformation import Anisotropy, Isotropy
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.kernels.experimental import ShearKernel, ShearKernel2in3out
from muygpys_tpu.gp.muygps import MuyGPS
from muygpys_tpu.gp.noise import HeteroscedasticNoise, HomoscedasticNoise
from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.ops import kernels as _k
from muygpys_tpu.ops.lanes_solver import serve_mean_and_variance_bl

_CLOSED_FORM_NU = {0.5, 1.5, 2.5, math.inf}


class FastServer:
    """Batched posterior-serving endpoint for a trained MuyGPS model.

    Args:
        muygps: trained model (Matern/RBF kernel, Isotropy/Anisotropy
            deformation, homoscedastic or heteroscedastic noise).
        nbrs_lookup: KNN index over the training features.
        train_features / train_targets: the training set (univariate or
            multivariate targets).
        bucket: compiled request size; queries are padded up to it.
            Geometry rule (``"pallas"``/``"fused"`` engines): the Pallas
            batch tile is ``gcd(local_bucket, 512)`` where ``local_bucket``
            is ``bucket / mesh_size`` under ``shard="queries"`` and
            ``bucket`` otherwise — pick a bucket whose local share is a
            multiple of 512 (single chip: any multiple of 512) or the
            kernels silently run on smaller, slower tiles.  A tile below
            256 emits a warning.
        engine: ``"lanes"`` | ``"pallas"`` | ``"fused"`` | ``"reference"``.
        measurement_noise: per-training-point noise variances
            ``(train_count,)`` — required when the model's noise is
            heteroscedastic (the model's stored tensor is gathered over a
            *training batch* and cannot address new query neighborhoods).
        rerank: ``"fused"`` engine only.  ``True`` (default) over-fetches
            candidates and exactly re-ranks them, so neighbor sets match
            the exact engines at ~0.9996.  ``False`` serves directly on the
            kernel's ``nn_count`` *approximate* nearest neighbors — no
            ``top_k``, no ``take_along_axis`` row shuffle — measured +27%
            end-to-end throughput (PERF.md r3).  The conditioning set then
            deviates from the exact one in ~0.1% of slots (replaced by the
            next-nearest neighbors), an unbiased perturbation of the same
            MuyGPs estimator rather than an approximation of its solve.
        mesh: optional ``jax.sharding.Mesh`` — multi-chip serving.  The
            query batch is sharded over every mesh axis and the training
            table replicated (the reference's only distributed strategy is
            the same batch-data parallelism, SURVEY §2.12); each device
            runs the full local chain (KNN -> gather -> solve) on its query
            shard with NO cross-device communication, so throughput scales
            linearly in expectation.  ``bucket`` must divide by the mesh
            size.  The ``"reference"`` debug engine does not take a mesh.
        shard: what the mesh shards — ``"queries"`` (default, above) or
            ``"train"``: the training table's ROWS are sharded and queries
            replicated.  Each device runs the candidate kernel over its
            shard for every query, the per-shard candidate rows are
            all-gathered over ICI (``O(devices * queries * nn)`` bytes —
            independent of train size), exactly re-ranked against the
            union, and each device solves its slice of the queries.  This
            is the million-scale regime: the single-chip chain is
            candidate-kernel-bound at ~120k preds/sec at 1M train rows
            (PERF.md r3), and the kernel work divides by the shard count.
            ``"fused"`` engine only; the union merge makes ``rerank``
            moot (always exact against the gathered candidates); the
            reference cannot distribute its KNN at all (index on rank 0,
            reference README.md:95-97).
        spatial_sort: ``"fused"`` engine only.  Morton-sort the training
            rows so the candidate kernel can prove entire (query_tile,
            train_tile) blocks irrelevant from bounding boxes and skip
            them — measured 3.9x candidate-kernel throughput at 1M rows
            with IDENTICAL candidate sets (PERF.md r3).  Default ``None``
            = auto: on when the kernel path is active and the feature
            dimension is <= 4 (low-dimensional spatial data; in high
            dimensions bounding boxes prune nothing).
    """

    def __init__(
        self,
        muygps: MuyGPS,
        nbrs_lookup: NN_Wrapper,
        train_features,
        train_targets,
        bucket: int = 4096,
        engine: str = "lanes",
        measurement_noise=None,
        rerank: bool = True,
        mesh=None,
        shard: str = "queries",
        spatial_sort: Optional[bool] = None,
    ):
        self._shear = isinstance(
            muygps.kernel, (ShearKernel, ShearKernel2in3out)
        )
        if not self._shear:
            if not isinstance(muygps.kernel, (Matern, RBF)):
                raise ValueError(
                    "FastServer supports Matern/RBF/Shear kernels, not "
                    f"{type(muygps.kernel)}"
                )
            if not isinstance(
                muygps.kernel.deformation, (Isotropy, Anisotropy)
            ):
                raise ValueError(
                    "FastServer requires an Isotropy or Anisotropy "
                    f"deformation, not {type(muygps.kernel.deformation)}"
                )
        if engine not in ("lanes", "pallas", "fused", "reference"):
            raise ValueError(f"unknown engine {engine!r}")
        if self._shear and engine not in ("lanes", "pallas"):
            raise ValueError(
                "shear models serve via the lanes engine (multi-output "
                "block batch-on-lanes solver) or the pallas engine "
                "(fused VMEM block solve, r5)"
            )
        if self._shear and measurement_noise is not None:
            raise ValueError(
                "shear serving does not take per-point measurement noise "
                "(ShearNoise33 is the lensing noise model)"
            )
        if self._shear and shard == "train":
            raise ValueError(
                "shear serving shards queries (shard='train' is a fused-"
                "engine mode)"
            )

        self.muygps = muygps
        self.nbrs = nbrs_lookup
        self.bucket = bucket
        self.engine = engine
        self.rerank = rerank
        self.mesh = mesh
        self.spatial_sort = spatial_sort
        if shard not in ("queries", "train"):
            raise ValueError(f"unknown shard mode {shard!r}")
        self.shard = shard
        if mesh is not None:
            if engine == "reference":
                raise ValueError(
                    "the reference debug engine does not take a mesh"
                )
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if bucket % n_dev:
                raise ValueError(
                    f"bucket {bucket} must divide by the mesh size {n_dev}"
                )
            if shard == "train":
                if engine != "fused":
                    raise ValueError(
                        "shard='train' requires the fused engine (the other"
                        " engines take host-computed global neighbor"
                        " indices)"
                    )
                if np.asarray(train_features).shape[0] % n_dev:
                    raise ValueError(
                        f"train_count {np.asarray(train_features).shape[0]}"
                        f" must divide by the mesh size {n_dev} for"
                        " shard='train'"
                    )
                # queries replicated: the kernel sees the FULL bucket
                self._local_bucket = bucket
            else:
                self._local_bucket = bucket // n_dev
        else:
            self._local_bucket = bucket
        self._train = jnp.asarray(np.atleast_2d(np.asarray(train_features)))
        if self._train.shape[0] == 1 and np.asarray(train_features).ndim == 1:
            self._train = self._train.T
        targets = np.asarray(train_targets)
        if targets.ndim == 1:
            targets = targets[:, None]
        self._targets = jnp.asarray(targets)
        self._response_count = targets.shape[1]
        feature_count = self._train.shape[1]

        if self._shear:
            # multi-output block path: noise/scale/Kout are composed by
            # MuyGPS.posterior_mean_and_variance itself
            self._predict_fn = self._build_shear()
            return

        # noise model
        if isinstance(muygps.noise, HeteroscedasticNoise):
            if measurement_noise is None:
                raise ValueError(
                    "heteroscedastic serving requires the per-training-point "
                    "measurement_noise vector"
                )
            eps = np.asarray(measurement_noise).reshape(-1)
            if eps.shape[0] != self._train.shape[0]:
                raise ValueError(
                    f"measurement_noise has {eps.shape[0]} entries for "
                    f"{self._train.shape[0]} training points"
                )
            self._measurement_noise = jnp.asarray(eps, self._train.dtype)
            self._noise = 0.0
        elif isinstance(muygps.noise, HomoscedasticNoise):
            self._measurement_noise = None
            self._noise = float(muygps.noise())
        else:
            raise ValueError(
                f"FastServer does not support noise {type(muygps.noise)}"
            )

        # length scales, one per feature (isotropy replicates its scalar)
        deformation = muygps.kernel.deformation
        ls = np.asarray(deformation.length_scale(), float).reshape(-1)
        if isinstance(deformation, Anisotropy):
            if ls.shape[0] != feature_count:
                raise ValueError(
                    f"{ls.shape[0]} anisotropic length scales for "
                    f"{feature_count} features"
                )
            self._ls_vec = ls
        else:
            self._ls_vec = np.full(feature_count, float(ls[0]))
        self._scale = float(np.asarray(muygps.scale()).reshape(-1)[0])

        if isinstance(muygps.kernel, RBF):
            self._nu = math.inf
            self._is_rbf = True
        else:
            self._nu = float(muygps.kernel.smoothness())
            self._is_rbf = False
        self._metric_power = 2 if deformation.metric.name == "F2" else 1
        if engine in ("pallas", "fused"):
            if not self._is_rbf and self._nu not in _CLOSED_FORM_NU:
                from muygpys_tpu.pallas.matern_nu import NU_MAX, NU_MIN

                if not (NU_MIN <= self._nu <= NU_MAX):
                    raise ValueError(
                        f"{engine} engine serves general Matern smoothness "
                        f"in [{NU_MIN}, {NU_MAX}]; got {self._nu} (use the "
                        "lanes engine for exotic orders)"
                    )
                if self._metric_power != 1:
                    raise ValueError(
                        "general-smoothness Matern requires the l2 metric"
                    )
        if engine == "reference" and self._measurement_noise is not None:
            raise ValueError(
                "the reference engine serves homoscedastic models only"
            )

        self._predict_fn = self._build()

    # -- assembly + predict program (compiled once per bucket) --

    def _build_shear(self):
        """Serving program for the lensing shear family (SURVEY §2.4):
        difference-tensor assembly -> shear covariance blocks ->
        multi-output batch-on-lanes Cholesky -> posterior mean + full
        (O, O) covariance per query.  Reference context:
        ``gp/kernels/experimental/shear.py:60-265`` (the reference has no
        serving machinery for it at all).

        Returns from ``predict``: mean ``(B, 3)`` and covariance
        ``(B, 3, 3)``.  Observed inputs are 3-component (kappa, gamma1,
        gamma2) for :class:`ShearKernel` or 2-component (gamma1, gamma2)
        for :class:`ShearKernel2in3out`.

        ``engine="pallas"`` (r5) swaps the XLA batch-on-lanes block
        Cholesky for the fused VMEM kernel
        (:func:`muygpys_tpu.pallas.multiout_solve.multiout_serve_pallas`)
        — the (I*n, I*n) augmented elimination runs in one Pallas pass
        per batch tile; block ASSEMBLY (the shear derivative polynomials)
        stays in XLA where it fuses elementwise."""
        train = self._train
        targets = self._targets
        muygps = self.muygps
        deformation = muygps.kernel.deformation
        kernel = muygps.kernel
        obs = 2 if isinstance(kernel, ShearKernel2in3out) else 3
        if targets.shape[1] != obs:
            raise ValueError(
                f"{type(kernel).__name__} observes {obs} components; "
                f"train_targets has {targets.shape[1]}"
            )

        if self.engine == "pallas":
            from muygpys_tpu.pallas.multiout_solve import (
                multiout_serve_pallas,
            )

            interp = jax.default_backend() == "cpu"

            def solve(Kin, Kcross, nnt):
                mean, cov = multiout_serve_pallas(
                    muygps.noise.perturb(Kin), Kcross, kernel.Kout(),
                    nnt, interpret=interp,
                )
                return mean, muygps.scale() * cov

        else:

            def solve(Kin, Kcross, nnt):
                return muygps.posterior_mean_and_variance(
                    Kin, Kcross, nnt
                )

        def core(queries, nn_idx, train, targets):
            pw = deformation.pairwise_tensor(train, nn_idx)
            cw = deformation.crosswise_tensor(
                queries, train, jnp.arange(queries.shape[0]), nn_idx
            )
            Kin = kernel(pw)
            Kcross = kernel(cw)
            nnt = jnp.swapaxes(targets[nn_idx], -2, -1)  # (B, obs, n)
            return solve(Kin, Kcross, nnt)

        consts = (train, targets)
        if self.mesh is None:

            @jax.jit
            def predict(*args):
                return core(*args, *consts)

            return predict

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from muygpys_tpu.parallel.sharding import batch_spec, replicate

        mesh = self.mesh
        in_specs = (batch_spec(mesh, 2), batch_spec(mesh, 2), P(), P())
        out_specs = (batch_spec(mesh, 2), batch_spec(mesh, 3))
        consts = tuple(replicate(c, mesh) for c in consts)
        sharded_core = shard_map(
            core, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        @jax.jit
        def predict(*args):
            return sharded_core(*args, *consts)

        return predict

    def _kernel_smoothness(self, dtype):
        """(smoothness arg, gen-coefficient vector) for the Pallas kernels.

        Closed-form orders compile their formula in; any other smoothness
        ships as a host-built f64 coefficient vector (SMEM input), so ONE
        cached executable still serves every general-smoothness model of a
        given shape."""
        if self._is_rbf:
            return "rbf", None
        if self._nu in _CLOSED_FORM_NU:
            return self._nu, None
        from muygpys_tpu.pallas.matern_nu import matern_nu_coeffs_host

        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        return "gen", jnp.asarray(
            matern_nu_coeffs_host(self._nu, np_dtype)
        )

    @staticmethod
    def _pallas_tile(local_bucket: int, max_tile: int = 512) -> int:
        """Pallas batch tile: ``gcd(local_bucket, max_tile)``; warn when
        the geometry quietly degrades (e.g. bucket 4096 on 24 devices ->
        local bucket 170 -> tile 2).  General-smoothness kernels cap at
        256 (the surrogate's VMEM temporaries overflow the 16M scoped
        budget at 512)."""
        tile = int(math.gcd(local_bucket, max_tile))
        if tile < 256:
            import warnings

            warnings.warn(
                f"FastServer bucket geometry: local bucket {local_bucket} "
                f"gives a Pallas batch tile of {tile} (< 256); throughput "
                "degrades on small tiles.  Choose a bucket whose per-device "
                f"share is a multiple of {max_tile}.",
                stacklevel=3,
            )
        return tile

    def _kernel_eval(self, u):
        """Kernel value from length-scaled distances."""
        if self._is_rbf:
            return _k.rbf_fn(u)
        if self._nu == 0.5:
            return _k.matern_05_fn(u)
        if self._nu == 1.5:
            return _k.matern_15_fn(u)
        if self._nu == 2.5:
            return _k.matern_25_fn(u)
        if self._nu == math.inf:
            return _k.matern_inf_fn(u)
        return _k.matern_gen_fn(u, self._nu)

    def _build(self):
        train = self._train
        targets = self._targets
        noise = self._noise
        scale = self._scale
        nn_count = self.nbrs.nn_count
        meas = self._measurement_noise
        # feature pre-scaling: anisotropic distance == isotropic(ls=1)
        # distance of per-feature-scaled coordinates
        inv_ls = jnp.asarray(1.0 / self._ls_vec, train.dtype)

        def assemble_bl(queries, nn_idx, train, targets):
            # batch-last scaled-distance assembly straight from gathers
            nf = train[nn_idx] * inv_ls  # (B, n, f)
            q = queries * inv_ls  # (B, f)
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
            if self._metric_power == 1:
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

        if self.engine == "fused":
            from muygpys_tpu.pallas.fused_predict import (
                fused_predict_coords_bl,
            )
            from muygpys_tpu.pallas.knn import (
                knn_pallas,
                knn_pallas_pruned,
                spatial_sort,
            )

            # under a mesh each device runs the chain on its local query
            # shard, so the Pallas batch tile divides the LOCAL bucket
            nu, gen_co = self._kernel_smoothness(train.dtype)
            tile = self._pallas_tile(
                self._local_bucket, 256 if nu == "gen" else 512
            )
            interp = jax.default_backend() == "cpu"
            params = jnp.concatenate(
                [
                    jnp.asarray(self._ls_vec, train.dtype),
                    jnp.asarray([noise], train.dtype),
                ]
            )
            metric_power = self._metric_power
            d_feat = train.shape[1]
            r = targets.shape[1]

            # below 2*bins=1024 train rows the packed-key kernel cannot fill
            # every candidate slot with a distinct real column (duplicate
            # indices possible, muygpys_tpu/pallas/knn.py) — and single-tile
            # exact brute force is faster at that scale
            use_kernel = train.shape[0] >= 1024

            # spatial pruning: Morton-sort the training rows so the
            # candidate kernel can skip (query_tile, train_tile) blocks
            # whose bounding boxes are provably beyond the k-th neighbor —
            # 3.9x kernel throughput at 1M rows, candidate sets identical
            # (PERF.md r3).  Low-dimensional spatial data only.
            spatial = self.spatial_sort
            if spatial is None:
                spatial = use_kernel and d_feat <= 4
            if spatial and not use_kernel:
                raise ValueError(
                    "spatial_sort requires the candidate kernel "
                    "(>= 1024 training points)"
                )
            if spatial:
                perm = np.asarray(spatial_sort(train))
                train = train[perm]
                targets = targets[perm]
                if meas is not None:
                    meas = meas[perm]
            self._spatial = bool(spatial)

            # one packed table -> ONE row gather per query batch (TPU row
            # gathers cost more than the KNN kernel itself, PERF.md r2)
            cols = [train, targets]
            if meas is not None:
                cols.append(meas[:, None])
            table = jnp.concatenate(
                [jnp.asarray(c, train.dtype) for c in cols], axis=1
            )
            # +8 over-fetch: measured agreement 0.9996 after exact re-rank
            # at the 512-bin kernel default (PERF.md r2 tuning table).
            # Without re-rank the kernel's nn_count candidates ARE the
            # neighborhood (no over-fetch: selection happens in the merge)
            rerank = self.rerank
            cand_count = (
                min(nn_count + 8, train.shape[0]) if rerank else nn_count
            )

            # kernel geometry per mode (PERF.md r3 tuning sweep): the exact
            # mode keeps 512 bins (candidate recall 0.9996 after re-rank);
            # the approximate mode halves the bins and doubles the query
            # tile — merge cost halves, 4.52 ms vs 5.91 ms per 8192 queries
            knn_kwargs = (
                {} if rerank else {"bins": 256, "query_tile": 256}
            )
            # Mosaic kernels do not lower on the CPU backend: interpret
            # mode is the only execution path there (virtual-mesh dryruns,
            # CPU CI) and is semantics-identical
            if jax.default_backend() == "cpu":
                knn_kwargs["interpret"] = True
            knn_fn = knn_pallas_pruned if spatial else knn_pallas

            def core(queries, table, train):
                if use_kernel:
                    cand, _ = knn_fn(
                        train, queries, cand_count, **knn_kwargs
                    )
                else:
                    from muygpys_tpu.neighbors import _brute_force_knn

                    cand, _ = _brute_force_knn(train, queries, cand_count)
                rows = table[cand]  # (B, C, d+r(+1))
                if rerank:
                    xc = rows[:, :, :d_feat]
                    d2 = jnp.sum((xc - queries[:, None, :]) ** 2, -1)
                    _, sel = jax.lax.top_k(-d2, nn_count)  # exact re-rank
                    rows = jnp.take_along_axis(
                        rows, sel[:, :, None], axis=1
                    )
                nf = jnp.transpose(rows[:, :, :d_feat], (1, 2, 0))
                y = jnp.transpose(
                    rows[:, :, d_feat:d_feat + r], (1, 2, 0)
                )
                noise_nn = (
                    None if meas is None else rows[:, :, d_feat + r].T
                )
                mean, var = fused_predict_coords_bl(
                    nf, queries.T, y, params,
                    noise_nn=noise_nn,
                    gen_coeffs=gen_co,
                    smoothness=nu,
                    metric_power=metric_power,
                    batch_tile=tile,
                    interpret=interp,
                )
                return mean.T, scale * var  # (B, r), (B,)

            consts = (table, train)
            n_sharded = 1

            if self.mesh is not None and self.shard == "train":
                axis_names = tuple(self.mesh.axis_names)
                ax = axis_names[0] if len(axis_names) == 1 else axis_names
                n_dev = int(
                    np.prod([self.mesh.shape[a] for a in axis_names])
                )
                local_q = self.bucket // n_dev
                solve_tile = self._pallas_tile(
                    local_q, 256 if nu == "gen" else 512
                )
                shard_rows = train.shape[0] // n_dev
                use_kernel_local = shard_rows >= 1024
                # per-shard candidate count cannot exceed the shard size
                # (tiny dryrun shards); the union merge still needs
                # nn_count total candidates across devices
                cand_count = min(cand_count, shard_rows)
                if n_dev * cand_count < nn_count:
                    raise ValueError(
                        f"{n_dev} shards x {cand_count} candidates cannot "
                        f"cover nn_count={nn_count}"
                    )

                def core(queries, table, train):
                    # 1. candidates over the LOCAL train shard, all queries
                    # (global Morton sort + contiguous sharding makes every
                    # shard spatially compact, so pruning also composes)
                    if use_kernel_local:
                        cand, _ = knn_fn(
                            train, queries, cand_count, **knn_kwargs
                        )
                    else:
                        from muygpys_tpu.neighbors import _brute_force_knn

                        cand, _ = _brute_force_knn(
                            train, queries, cand_count
                        )
                    rows = table[cand]  # (B, C, cols) from the local shard
                    # 2. union of every shard's candidate ROWS:
                    # O(devices * B * C) bytes over ICI, train-size-free
                    gathered = jax.lax.all_gather(rows, ax)
                    rows = jnp.moveaxis(gathered, 0, 1).reshape(
                        queries.shape[0], n_dev * cand_count, -1
                    )
                    # 3. exact merge of the union (coords ride in the rows)
                    xc = rows[:, :, :d_feat]
                    d2 = jnp.sum((xc - queries[:, None, :]) ** 2, -1)
                    _, sel = jax.lax.top_k(-d2, nn_count)
                    rows = jnp.take_along_axis(
                        rows, sel[:, :, None], axis=1
                    )
                    # 4. each device solves its own slice of the queries
                    idx = jax.lax.axis_index(ax)
                    q_lo = idx * local_q
                    rows_l = jax.lax.dynamic_slice_in_dim(
                        rows, q_lo, local_q, 0
                    )
                    q_l = jax.lax.dynamic_slice_in_dim(
                        queries, q_lo, local_q, 0
                    )
                    nf = jnp.transpose(rows_l[:, :, :d_feat], (1, 2, 0))
                    y = jnp.transpose(
                        rows_l[:, :, d_feat:d_feat + r], (1, 2, 0)
                    )
                    noise_nn = (
                        None if meas is None
                        else rows_l[:, :, d_feat + r].T
                    )
                    mean, var = fused_predict_coords_bl(
                        nf, q_l.T, y, params,
                        noise_nn=noise_nn,
                        gen_coeffs=gen_co,
                        smoothness=nu,
                        metric_power=metric_power,
                        batch_tile=solve_tile,
                        interpret=interp,
                    )
                    return mean.T, scale * var  # local (B/n_dev, r) slice

        elif self.engine == "pallas":
            from muygpys_tpu.pallas.fused_predict import (
                fused_predict_coords_bl,
            )

            nu, gen_co = self._kernel_smoothness(train.dtype)
            tile = self._pallas_tile(
                self._local_bucket, 256 if nu == "gen" else 512
            )
            interp = jax.default_backend() == "cpu"
            params = jnp.concatenate(
                [
                    jnp.asarray(self._ls_vec, train.dtype),
                    jnp.asarray([noise], train.dtype),
                ]
            )
            metric_power = self._metric_power

            def core(queries, nn_idx, train, targets, *opt):
                nf = jnp.transpose(train[nn_idx], (1, 2, 0))  # (n, d, B)
                q = queries.T  # (d, B)
                y = jnp.transpose(targets[nn_idx], (1, 2, 0))  # (n, r, B)
                noise_nn = None if meas is None else opt[0][nn_idx].T
                mean, var = fused_predict_coords_bl(
                    nf, q, y, params,
                    noise_nn=noise_nn,
                    gen_coeffs=gen_co,
                    smoothness=nu,
                    metric_power=metric_power,
                    batch_tile=tile,
                    interpret=interp,
                )
                return mean.T, scale * var  # (B, r), (B,)

            consts = (train, targets) + (() if meas is None else (meas,))
            n_sharded = 2

        elif self.engine == "lanes":

            def core(queries, nn_idx, train, targets, *opt):
                pw, cw, y = assemble_bl(queries, nn_idx, train, targets)
                eye = jnp.eye(nn_count, dtype=pw.dtype)[:, :, None]
                if meas is None:
                    Kin = self._kernel_eval(pw) + noise * eye
                else:
                    Kin = self._kernel_eval(pw) + eye * opt[0][nn_idx].T[
                        :, None, :
                    ]
                Kcross = self._kernel_eval(cw)
                mean, var = serve_mean_and_variance_bl(
                    Kin, Kcross, jnp.asarray(1.0, pw.dtype), y
                )
                return mean.T, scale * var  # (B, r), (B,)

            consts = (train, targets) + (() if meas is None else (meas,))
            n_sharded = 2

        else:  # reference engine (single-device debug path)

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

        if self.mesh is None:

            @jax.jit
            def predict(*args):
                return core(*args, *consts)

            return predict

        # multi-chip: queries (and neighbor indices) sharded over every
        # mesh axis, training table replicated — each device serves its
        # query shard with zero collectives (the reference's batch-data
        # parallelism, SURVEY §2.12, applied to serving)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from muygpys_tpu.parallel.sharding import batch_spec, replicate

        from muygpys_tpu.parallel.sharding import shard as _shard

        mesh = self.mesh
        if self.shard == "train":
            # queries replicated, table rows sharded, outputs query-sharded
            in_specs = (P(),) + tuple(
                batch_spec(mesh, c.ndim) for c in consts
            )
            consts = tuple(_shard(c, mesh) for c in consts)
        else:
            in_specs = tuple(
                batch_spec(mesh, 2) for _ in range(n_sharded)
            ) + tuple(P() for _ in consts)
            consts = tuple(replicate(c, mesh) for c in consts)
        out_specs = (batch_spec(mesh, 2), batch_spec(mesh, 1))
        # check_vma off: pallas_call inside shard_map would need explicit
        # per-output vma annotations; the chain is embarrassingly parallel
        # (no collectives), so there is nothing for the checker to verify
        sharded_core = shard_map(
            core, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

        @jax.jit
        def predict(*args):
            return sharded_core(*args, *consts)

        return predict

    def predict(self, test_features) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (mean, variance) for a batch of queries (any size)."""
        test = np.atleast_2d(np.asarray(test_features))
        if np.asarray(test_features).ndim == 1:
            test = np.asarray(test_features)[:, None]
        count = test.shape[0]
        fused = self.engine == "fused"
        nn_idx = None if fused else self.nbrs.get_nns(test)[0]

        means, variances = [], []
        for start in range(0, count, self.bucket):
            chunk = test[start : start + self.bucket]
            pad = self.bucket - chunk.shape[0]
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)), mode="edge")
            if fused:
                m, v = self._predict_fn(jnp.asarray(chunk))
            else:
                idx = np.asarray(nn_idx)[start : start + self.bucket]
                if pad:
                    idx = np.pad(idx, ((0, pad), (0, 0)), mode="edge")
                m, v = self._predict_fn(
                    jnp.asarray(chunk), jnp.asarray(idx)
                )
            means.append(np.asarray(m))
            variances.append(np.asarray(v))
        mean = np.concatenate(means)[:count]
        var = np.concatenate(variances)[:count]
        return mean, var
