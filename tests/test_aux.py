"""Auxiliary subsystem tests: mini-batch chassis, checkpointing, benchmark
harness."""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu._test.sampler import UnivariateSampler
from muygpys_tpu.checkpoint import (
    load_fast_state,
    load_model,
    save_fast_state,
    save_model,
)
from muygpys_tpu.gp import MultivariateMuyGPS, MuyGPS
from muygpys_tpu.gp.deformation import (
    Anisotropy,
    DifferenceIsotropy,
    F2,
    Isotropy,
    l2,
)
from muygpys_tpu.gp.hyperparameter import (
    AnalyticScale,
    DownSampleScale,
    FixedScale,
    Parameter,
    VectorParameter,
)
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.kernels.experimental import ShearKernel
from muygpys_tpu.gp.noise import (
    HeteroscedasticNoise,
    HomoscedasticNoise,
    NullNoise,
    ShearNoise33,
)
from muygpys_tpu.optimize.experimental import (
    optimize_from_tensors_mini_batch,
)
from muygpys_tpu.performance.benchmark import BenchmarkPipeline, benchmark_fn


class TestMiniBatch:
    def test_recovery(self, rng):
        sampler = UnivariateSampler(
            data_count=500, train_ratio=0.5, nu=1.5, length_scale=0.05,
            measurement_noise=1e-3, rng=rng,
        )
        xtr, _ = sampler.features()
        ytr, _ = sampler.sample()
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(
                    l2, length_scale=Parameter(0.3, (0.01, 1.0))
                ),
            ),
            noise=HomoscedasticNoise(1e-3),
            scale=AnalyticScale(),
        )
        opt, nbrs, t, probed, steps = optimize_from_tensors_mini_batch(
            model, xtr, ytr,
            nn_count=20, batch_count=150, train_count=xtr.shape[0],
            num_epochs=2, probe_previous=True,
            init_points=3, n_iter=8, random_state=0, rng=rng,
        )
        ls = float(opt.kernel.deformation.length_scale())
        assert ((0.05 - ls) / 0.05) ** 2 < 9e-1, f"ls={ls}"
        assert opt.scale.trained
        assert probed >= 2 and steps == 2 * 11
        assert t > 0

    def test_device_engine_recovery(self, rng):
        """engine='device-lbfgs': one on-device L-BFGS trajectory per epoch,
        warm-started; recovers length scale at the chassis tolerance."""
        sampler = UnivariateSampler(
            data_count=500, train_ratio=0.5, nu=1.5, length_scale=0.05,
            measurement_noise=1e-3, rng=rng,
        )
        xtr, _ = sampler.features()
        ytr, _ = sampler.sample()
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(
                    l2, length_scale=Parameter(0.3, (0.01, 1.0))
                ),
            ),
            noise=HomoscedasticNoise(1e-3),
            scale=AnalyticScale(),
        )
        opt, nbrs, t, probed, steps = optimize_from_tensors_mini_batch(
            model, xtr, ytr,
            nn_count=20, batch_count=150, train_count=xtr.shape[0],
            num_epochs=3, keep_state=True, engine="device-lbfgs", rng=rng,
        )
        ls = float(opt.kernel.deformation.length_scale())
        assert ((0.05 - ls) / 0.05) ** 2 < 9e-1, f"ls={ls}"
        assert opt.scale.trained
        assert steps >= 3 and probed == 0
        import pytest as _pt
        from muygpys_tpu.optimize import pseudo_huber_fn
        with _pt.raises(ValueError, match="lool/mse"):
            optimize_from_tensors_mini_batch(
                model, xtr, ytr, nn_count=20, batch_count=150,
                train_count=xtr.shape[0], engine="device-lbfgs",
                loss_fn=pseudo_huber_fn, rng=rng,
            )

    def test_device_engine_hierarchical(self, rng):
        """engine='device-lbfgs' trains hierarchical (nonstationary) length
        scales (r4): per-epoch batch features derive internally; knot
        values move and stay in bounds."""
        from muygpys_tpu.gp.hyperparameter.experimental import (
            HierarchicalParameter,
        )
        from muygpys_tpu.gp.kernels import RBF

        rng2 = np.random.default_rng(3)
        xtr = rng2.uniform(size=(300, 1))
        ytr = np.sin(8.0 * xtr[:, 0])[:, None] + 0.05 * rng2.standard_normal(
            (300, 1)
        )
        knots = np.array([[0.25], [0.75]])
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(
                    l2,
                    length_scale=HierarchicalParameter(
                        knots,
                        VectorParameter(
                            Parameter(0.3, (0.02, 1.0)),
                            Parameter(0.3, (0.02, 1.0)),
                        ),
                        RBF(),
                    ),
                ),
            ),
            noise=HomoscedasticNoise(1e-3),
            scale=AnalyticScale(),
        )
        opt, nbrs, _, _, steps = optimize_from_tensors_mini_batch(
            model, jnp.asarray(xtr), jnp.asarray(ytr),
            nn_count=12, batch_count=96, train_count=300,
            num_epochs=2, engine="device-lbfgs",
            batch_features=True, rng=rng,
        )
        vals = [
            float(opt.kernel._hyperparameters[f"length_scale{i}"]())
            for i in range(2)
        ]
        assert steps >= 2
        assert all(0.02 <= v <= 1.0 for v in vals)
        assert any(abs(v - 0.3) > 1e-5 for v in vals), vals

    def test_anisotropic_rebuild(self, rng):
        from muygpys_tpu._test.sampler import UnivariateSampler2D

        sampler = UnivariateSampler2D(
            points_per_dim=20, train_ratio=0.5, nu=1.5, length_scale=0.1,
            rng=rng,
        )
        xtr, _ = sampler.features()
        ytr, _ = sampler.sample()
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Anisotropy(
                    l2,
                    VectorParameter(
                        Parameter(0.5, (0.01, 1.0)),
                        Parameter(0.5, (0.01, 1.0)),
                    ),
                ),
            ),
            noise=HomoscedasticNoise(1e-3),
            scale=AnalyticScale(),
        )
        opt, nbrs, _, _, _ = optimize_from_tensors_mini_batch(
            model, xtr, ytr,
            nn_count=10, batch_count=100, train_count=200,
            num_epochs=2, init_points=2, n_iter=3, random_state=0, rng=rng,
        )
        names, params, _ = opt.get_opt_params()
        assert names == ["length_scale0", "length_scale1"]


class TestCheckpoint:
    def test_muygps_roundtrip(self, tmp_path):
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.7, (0.3, 3.0)),
                deformation=Isotropy(
                    l2, length_scale=Parameter(0.42, (0.01, 2.0))
                ),
            ),
            noise=HomoscedasticNoise(3e-3, (1e-5, 1e-1)),
            scale=AnalyticScale(),
        )
        model.scale._set(2.5)
        path = str(tmp_path / "model.json")
        save_model(path, model)
        restored = load_model(path)
        assert restored == model
        assert float(restored.scale()) == 2.5
        assert restored.scale.trained
        names, params, bounds = restored.get_opt_params()
        assert names == ["length_scale", "smoothness", "noise"]

    def test_anisotropic_rbf_roundtrip(self, tmp_path):
        model = MuyGPS(
            kernel=RBF(
                deformation=Anisotropy(
                    F2,
                    VectorParameter(
                        Parameter(0.3, (0.01, 1.0)), Parameter(0.9)
                    ),
                )
            ),
            noise=NullNoise(),
            scale=FixedScale(),
        )
        path = str(tmp_path / "model.json")
        save_model(path, model)
        restored = load_model(path)
        np.testing.assert_allclose(
            np.asarray(restored.kernel.deformation.length_scale()),
            [0.3, 0.9],
        )

    def test_heteroscedastic_and_shear_roundtrip(self, tmp_path, rng):
        noise_tensor = rng.uniform(0.01, 0.1, size=(50, 10))
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(2.5),
                deformation=Isotropy(l2, length_scale=Parameter(1.0)),
            ),
            noise=HeteroscedasticNoise(jnp.asarray(noise_tensor)),
        )
        path = str(tmp_path / "het.json")
        save_model(path, model)
        restored = load_model(path)
        np.testing.assert_allclose(
            np.asarray(restored.noise()), noise_tensor
        )

        shear_model = MuyGPS(
            kernel=ShearKernel(
                deformation=DifferenceIsotropy(
                    F2, length_scale=Parameter(0.1)
                )
            ),
            noise=ShearNoise33(1e-4),
        )
        path2 = str(tmp_path / "shear.json")
        save_model(path2, shear_model)
        restored2 = load_model(path2)
        assert isinstance(restored2.kernel, ShearKernel)
        assert isinstance(restored2.noise, ShearNoise33)

    def test_multivariate_roundtrip(self, tmp_path):
        with pytest.warns(DeprecationWarning):
            model = MultivariateMuyGPS(
                {
                    "kernel": Matern(
                        smoothness=Parameter(0.5),
                        deformation=Isotropy(
                            l2, length_scale=Parameter(0.7)
                        ),
                    ),
                    "noise": HomoscedasticNoise(1e-4),
                    "scale": DownSampleScale(down_count=5),
                },
                {
                    "kernel": Matern(
                        smoothness=Parameter(1.5),
                        deformation=Isotropy(
                            l2, length_scale=Parameter(0.2)
                        ),
                    ),
                    "noise": HomoscedasticNoise(1e-4),
                    "scale": AnalyticScale(),
                },
            )
        path = str(tmp_path / "mmodel.json")
        save_model(path, model)
        restored = load_model(path)
        assert isinstance(restored, MultivariateMuyGPS)
        assert len(restored.models) == 2
        assert restored.models[0] == model.models[0]
        assert isinstance(restored.models[0].scale, DownSampleScale)

    def test_fast_state_roundtrip(self, tmp_path, rng):
        coeffs = rng.standard_normal((100, 10))
        nn = rng.integers(0, 100, (100, 10))
        path = str(tmp_path / "fast.npz")
        save_fast_state(path, coeffs, nn)
        c2, n2 = load_fast_state(path)
        np.testing.assert_array_equal(c2, coeffs)
        np.testing.assert_array_equal(n2, nn)


class TestBenchmarkHarness:
    def test_stages(self):
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(
                    l2, length_scale=Parameter(0.5, (0.1, 2.0))
                ),
            ),
            noise=HomoscedasticNoise(1e-3),
            scale=AnalyticScale(),
        )
        pipe = BenchmarkPipeline(
            model, batch_count=64, nn_count=8, feature_count=2
        )
        timings = pipe.run(iters=2)
        expected = {
            "pairwise_tensor", "crosswise_tensor", "kernel_Kin",
            "kernel_Kcross", "posterior_mean", "posterior_variance",
            "scale_optim", "lool_objective", "lool_objective_grad",
        }
        assert set(timings) == expected
        assert all(v > 0 for v in timings.values())

    def test_benchmark_fn(self):
        import jax.numpy as jnp

        t = benchmark_fn(lambda x: jnp.sum(x * x), jnp.ones(100), iters=3)
        assert t > 0

    @pytest.mark.slow  # unrolled lanes loop compiles ~minutes on CPU
    def test_bench_train_loop_producers_agree(self, monkeypatch):
        """bench.py's train_steps_per_sec producers: the Pallas fused loop
        (interpret mode here) and the XLA lanes fallback compute the same
        initial LOO objective and finite trajectories.

        The two engines' noise gradients differ by design (the fused kernel
        mirrors the reference's stored-noise sigma^2 quirk, so d sigma^2 /
        d noise = 0 there), so only the first evaluation is compared
        tightly."""
        from muygpys_tpu.performance import headline as h

        monkeypatch.setattr(h, "TRAIN_BATCH", 64)
        inputs = h.make_train_inputs()
        a1 = float(np.asarray(h.xla_train_loop(1)(*inputs)))
        b1 = float(np.asarray(h.fused_train_loop(1, interpret=True)(*inputs)))
        assert np.isfinite(a1) and np.isfinite(b1)
        assert abs(a1 - b1) <= 1e-2 * max(1.0, abs(a1))
        a3 = float(np.asarray(h.xla_train_loop(3)(*inputs)))
        assert np.isfinite(a3)

    @pytest.mark.slow  # ~6 min of compiles (kve value_and_grad + gen kernel)
    def test_bench_train_gen_producers_agree(self, monkeypatch):
        """bench.py's train_steps_per_sec_gen producers (r4): the
        free-smoothness fused loop (traced-nu surrogate, interpret mode)
        and the exact-Bessel XLA fallback compute the same initial LOO
        objective and finite 3-step trajectories."""
        from muygpys_tpu.performance import headline as h

        monkeypatch.setattr(h, "TRAIN_BATCH", 64)
        inputs = h.make_train_inputs()
        a1 = float(np.asarray(h.xla_train_loop_gen(1)(*inputs)))
        b1 = float(
            np.asarray(h.fused_train_loop_gen(1, interpret=True)(*inputs))
        )
        assert np.isfinite(a1) and np.isfinite(b1)
        assert abs(a1 - b1) <= 1e-2 * max(1.0, abs(a1))
        a3 = float(np.asarray(h.xla_train_loop_gen(3)(*inputs)))
        b3 = float(
            np.asarray(h.fused_train_loop_gen(3, interpret=True)(*inputs))
        )
        assert np.isfinite(a3) and np.isfinite(b3)

    def test_bench_1m_inputs_shape(self, monkeypatch):
        """make_serve_1m_inputs: correct shapes at a scaled-down size (the
        real 1M build is bench-only)."""
        from muygpys_tpu.performance import headline as h

        monkeypatch.setattr(h, "TRAIN_COUNT_1M", 4096)
        monkeypatch.setattr(h, "Q_1M", 64)
        train, targets, queries = h.make_serve_1m_inputs()
        assert train.shape == (4096, h.D_FEAT)
        assert targets.shape == (4096, 1)
        assert queries.shape == (64, h.D_FEAT)


class TestConfig:
    def test_parse_flags(self):
        import jax
        from muygpys_tpu import config

        before = config.state.ftype
        rest = config.parse_flags(["--muygpys_ftype=64", "positional"])
        assert rest == ["positional"]
        assert config.state.ftype == 64
        assert jax.config.jax_enable_x64
        config.update("ftype", before)
        # restore x64 for the remainder of the CPU test session
        jax.config.update("jax_enable_x64", True)

    def test_parse_flags_rejects_unknown(self):
        from muygpys_tpu import config

        with pytest.raises(ValueError, match="unknown flag"):
            config.parse_flags(["--muygpys_backend=torch"])


class TestDownSampleScale:
    def test_downsample_estimates_scale(self, rng):
        from muygpys_tpu.gp.deformation import Isotropy, l2
        from muygpys_tpu.gp.hyperparameter import DownSampleScale, Parameter
        from muygpys_tpu.gp.kernels import Matern
        from muygpys_tpu.gp.noise import HomoscedasticNoise
        from muygpys_tpu._test import oracle

        n, nn = 200, 20
        x = rng.uniform(size=(n, 1))
        y = 3.0 * oracle.dense_gp_sample(rng, x, 1.5, 0.2, 1e-8)
        model = MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(l2, length_scale=Parameter(0.2)),
            ),
            noise=HomoscedasticNoise(1e-4),
            scale=DownSampleScale(down_count=10, iteration_count=8),
        )
        d = np.linalg.norm(x[:, None] - x[None], axis=-1)
        bni = np.argsort(d, axis=1)[:, 1 : nn + 1]
        _, pw, _, bnt = model.make_train_tensors(
            np.arange(n), bni, jnp.asarray(x), jnp.asarray(y)
        )
        model.optimize_scale(pw, bnt)
        got = float(np.asarray(model.scale()))
        # prior variance of the draw is 9; downsampled median is coarse
        assert 2.0 < got < 40.0, got
        assert model.scale.trained
