"""End-to-end workflow tests (mirror of reference tests/predict.py and the
api-test chassis _test/api.py: assert accuracy/MSE thresholds on synthetic
data)."""

import numpy as np
import pytest

from muygpys_tpu.gp.deformation import F2, Isotropy, l2
from muygpys_tpu.gp.hyperparameter import AnalyticScale, Parameter
from muygpys_tpu.gp.kernels import Matern, RBF
from muygpys_tpu.gp.noise import HomoscedasticNoise
from muygpys_tpu.optimize import Bayes_optimize, L_BFGS_B_optimize, lool_fn


def _sine_data(rng, n=1500, train_frac=0.15, noise=0.1):
    x = np.linspace(0, 4 * np.pi, n)[:, None]
    y = np.sin(x[:, 0])
    obs = y + noise * rng.standard_normal(n)
    mask = np.zeros(n, bool)
    mask[rng.choice(n, int(train_frac * n), replace=False)] = True
    return (
        x[mask], obs[mask][:, None], x[~mask], y[~mask],
    )


def _two_class_data(rng, n=1200):
    """Two noisy interleaved half-moons, one-hot (-1/1) labels."""
    t = rng.uniform(0, np.pi, n)
    cls = rng.integers(0, 2, n)
    x = np.stack(
        [
            np.cos(t) * (1 - 2 * cls) + 0.3 * rng.standard_normal(n) + cls,
            np.sin(t) * (1 - 2 * cls) + 0.3 * rng.standard_normal(n)
            + 0.5 * cls,
        ],
        axis=1,
    )
    labels = np.full((n, 2), -1.0)
    labels[np.arange(n), cls] = 1.0
    ntr = n // 2
    return x[:ntr], labels[:ntr], x[ntr:], labels[ntr:]


class TestRegress:
    def test_do_regress_fixed(self, rng):
        from muygpys_tpu.examples.regress import do_regress

        xtr, ytr, xte, yte = _sine_data(rng)
        model, nbrs, mean, var = do_regress(
            xte, xtr, ytr,
            nn_count=30,
            k_kwargs={
                "kernel": Matern(
                    smoothness=Parameter(1.5),
                    deformation=Isotropy(l2, length_scale=Parameter(1.0)),
                ),
                "noise": HomoscedasticNoise(1e-2),
                "scale": AnalyticScale(),
            },
        )
        mse = np.mean((mean[:, 0] - yte) ** 2)
        assert mse < 0.01, f"mse={mse}"
        assert var.shape[0] == mean.shape[0]
        assert model.scale.trained

    def test_do_regress_optimized(self, rng):
        from muygpys_tpu.examples.regress import do_regress

        xtr, ytr, xte, yte = _sine_data(rng)
        model, nbrs, mean, var = do_regress(
            xte, xtr, ytr,
            nn_count=30,
            # batch_count >= train_count: deterministic full-batch training
            batch_count=400,
            loss_fn=lool_fn,
            opt_fn=L_BFGS_B_optimize,
            k_kwargs={
                "kernel": Matern(
                    smoothness=Parameter(1.5),
                    deformation=Isotropy(
                        l2, length_scale=Parameter(2.0, (0.1, 10.0))
                    ),
                ),
                # noise free alongside ls: with fixed (misspecified) noise,
                # lool can prefer degenerate short length scales
                "noise": HomoscedasticNoise(1e-2, (1e-4, 1e-1)),
                "scale": AnalyticScale(),
            },
        )
        mse = np.mean((mean[:, 0] - yte) ** 2)
        assert mse < 0.02, f"mse={mse}"

    def test_do_regress_multivariate(self, rng):
        from muygpys_tpu.examples.regress import do_regress

        xtr, ytr, xte, yte = _sine_data(rng)
        ytr2 = np.concatenate([ytr, np.cos(xtr)], axis=1)
        k_args = [
            {
                "kernel": Matern(
                    smoothness=Parameter(1.5),
                    deformation=Isotropy(l2, length_scale=Parameter(1.0)),
                ),
                "noise": HomoscedasticNoise(1e-2),
                "scale": AnalyticScale(),
            }
            for _ in range(2)
        ]
        with pytest.warns(DeprecationWarning):
            model, nbrs, mean, var = do_regress(
                xte, xtr, ytr2, nn_count=30, k_kwargs=k_args
            )
        assert mean.shape == (xte.shape[0], 2)
        assert var.shape == (xte.shape[0], 2)
        mse0 = np.mean((mean[:, 0] - yte) ** 2)
        mse1 = np.mean((mean[:, 1] - np.cos(xte[:, 0])) ** 2)
        assert mse0 < 0.02 and mse1 < 0.02


class TestClassify:
    def test_do_classify(self, rng):
        from muygpys_tpu.examples.classify import do_classify

        xtr, ytr, xte, yte = _two_class_data(rng)
        model, nbrs, preds = do_classify(
            xte, xtr, ytr,
            nn_count=20,
            k_kwargs={
                "kernel": RBF(
                    deformation=Isotropy(
                        F2, length_scale=Parameter(0.5, (0.05, 2.0))
                    )
                ),
                "noise": HomoscedasticNoise(1e-3),
            },
            opt_kwargs={"init_points": 3, "n_iter": 5, "random_state": 0},
        )
        acc = np.mean(
            np.argmax(preds, axis=1) == np.argmax(yte, axis=1)
        )
        assert acc > 0.85, f"accuracy={acc}"


class TestClassifyUQ:
    def test_do_classify_uq(self):
        from muygpys_tpu.examples.two_class_classify_uq import (
            do_classify_uq,
            do_uq,
        )

        # own seed for BOTH the dataset and the workflow's internal batch
        # sampling: the ambiguous-vs-unambiguous accuracy property below is
        # statistical and must not depend on which tests ran first
        xtr, ytr, xte, yte = _two_class_data(np.random.default_rng(7))
        model, nbrs, preds, masks = do_classify_uq(
            xte, xtr, ytr,
            nn_count=20,
            opt_batch_count=150,
            uq_batch_count=300,
            rng=np.random.default_rng(11),
            k_kwargs={
                "kernel": RBF(
                    deformation=Isotropy(
                        F2, length_scale=Parameter(0.5, (0.05, 2.0))
                    )
                ),
                "noise": HomoscedasticNoise(1e-3),
            },
            opt_kwargs={"init_points": 3, "n_iter": 5, "random_state": 0},
        )
        accuracy, uq = do_uq(preds, yte, masks)
        assert accuracy > 0.85
        assert masks.shape == (5, xte.shape[0])
        assert uq.shape == (5, 3)
        # unambiguous accuracy should beat ambiguous accuracy on average
        valid = uq[:, 0] > 0
        assert np.all(uq[valid, 2] >= uq[valid, 1] - 0.05)


class TestFastPosteriorMean:
    def test_do_fast_posterior_mean(self, rng):
        from muygpys_tpu.examples.fast_posterior_mean import (
            do_fast_posterior_mean,
        )

        xtr, ytr, xte, yte = _sine_data(rng)
        model, nbrs, mean, coeffs, timing = do_fast_posterior_mean(
            xte, xtr, ytr,
            nn_count=30,
            k_kwargs={
                "kernel": Matern(
                    smoothness=Parameter(1.5),
                    deformation=Isotropy(l2, length_scale=Parameter(1.0)),
                ),
                "noise": HomoscedasticNoise(1e-2),
                "scale": AnalyticScale(),
            },
        )
        mse = np.mean((np.asarray(mean).reshape(-1) - yte) ** 2)
        assert mse < 0.02, f"mse={mse}"
        assert set(timing) == {"precompute", "agree", "nn", "pred"}
