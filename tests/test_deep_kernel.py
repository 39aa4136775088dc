"""Deep kernel MuyGPs tests (mirror of reference tests/torch/muygps_torch.py,
rebuilt on flax): train an embedding + GP jointly and check that prediction
quality beats the untrained model on a feature-scrambled regression task."""

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from muygpys_tpu.gp import MuyGPS
from muygpys_tpu.gp.deformation import Isotropy, l2
from muygpys_tpu.gp.hyperparameter import Parameter
from muygpys_tpu.gp.kernels import Matern
from muygpys_tpu.gp.noise import HomoscedasticNoise
from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.nn import DeepKernelMuyGPs
from muygpys_tpu.examples.deep_kernel import (
    predict_model,
    train_deep_kernel_muygps,
    update_nearest_neighbors,
)


class MLP(nn.Module):
    width: int = 16
    out: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width)(x)
        x = nn.tanh(x)
        return nn.Dense(self.out)(x)


@pytest.fixture(scope="module")
def problem(rng):
    """Targets depend on 2 of 6 features; embedding must learn to focus."""
    n = 600
    X = rng.uniform(size=(n, 6))
    y = (np.sin(2 * np.pi * X[:, 0]) + np.cos(2 * np.pi * X[:, 1]))[:, None]
    y += 0.05 * rng.standard_normal((n, 1))
    return X[:400], y[:400], X[400:], y[400:]


def _make_model():
    return DeepKernelMuyGPs(
        embedding=MLP(),
        muygps_model=MuyGPS(
            kernel=Matern(
                smoothness=Parameter(1.5),
                deformation=Isotropy(l2, length_scale=Parameter(1.0)),
            ),
            noise=HomoscedasticNoise(1e-3),
        ),
    )


def test_train_and_predict(problem, rng):
    """Joint embedding+GP training must reduce the objective and produce
    finite calibrated predictions.  (The reference's own torch test uses
    i.i.d. random data with target_mse=3.0 — a smoke bar; we additionally
    demand a large objective decrease on structured data.)"""
    xtr, ytr, xte, yte = problem
    nn_count = 20
    nbrs = NN_Wrapper(xtr, nn_count, nn_method="exact")
    batch_indices = rng.choice(400, 200, replace=False)
    model = _make_model()

    _, _, info_start = train_deep_kernel_muygps(
        model, xtr, ytr, batch_indices, nbrs,
        training_iterations=1, learning_rate=1e-2,
        rng_key=jax.random.PRNGKey(0),
    )
    nbrs_trained, params, info = train_deep_kernel_muygps(
        model, xtr, ytr, batch_indices, nbrs,
        training_iterations=150,
        learning_rate=1e-2,
        scheduler_decay=0.995,
        loss_function="lool",
        update_frequency=25,
        rng_key=jax.random.PRNGKey(0),
    )
    assert np.isfinite(info["final_loss"])
    assert info["final_loss"] < 0.1 * info_start["final_loss"], (
        f"{info_start['final_loss']} -> {info['final_loss']}"
    )

    mean, var = predict_model(
        model, params, xte, xtr, ytr, nbrs_trained, nn_count
    )
    assert mean.shape == (200, 1)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= -1e-8)
    mse = float(np.mean((np.asarray(mean)[:, 0] - yte[:, 0]) ** 2))
    # must not be worse than predicting the mean (reference bar: mse <= 3.0
    # on unit-variance noise)
    assert mse < 1.5 * np.var(yte), f"mse={mse}"

    # trained GP hyperparameters moved from their init
    log_ls = float(params["params"]["gp_layer"]["log_length_scale"])
    assert log_ls != 0.0


def test_update_nearest_neighbors(problem, rng):
    xtr, ytr, _, _ = problem
    model = _make_model()
    batch_indices = np.arange(100)
    params = model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(xtr),
        jnp.asarray(batch_indices),
        jnp.zeros((100, 10), dtype=int),
        jnp.asarray(ytr)[np.zeros((100, 10), dtype=int)],
    )
    nbrs, nn_idx, nn_targets = update_nearest_neighbors(
        model, params, xtr, ytr, batch_indices, 10
    )
    assert nn_idx.shape == (100, 10)
    assert nn_targets.shape == (100, 10, 1)
    assert nbrs.feature_count == 2  # embedded dimension


def test_loss_name_validation(problem, rng):
    xtr, ytr, _, _ = problem
    nbrs = NN_Wrapper(xtr, 10, nn_method="exact")
    with pytest.raises(ValueError, match="not supported"):
        train_deep_kernel_muygps(
            _make_model(), xtr, ytr, np.arange(50), nbrs,
            training_iterations=1, loss_function="nope",
        )


def test_multivariate_layer(problem, rng):
    """MultivariateMuyGPsLayer: per-response GP heads over one embedding."""
    import warnings
    from muygpys_tpu.gp import MultivariateMuyGPS
    from muygpys_tpu.nn import MultivariateMuyGPsLayer

    xtr, ytr, _, _ = problem
    y2 = np.concatenate([ytr, -ytr + 0.1], axis=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        mmodel = MultivariateMuyGPS(
            *(
                {
                    "kernel": Matern(
                        smoothness=Parameter(1.5),
                        deformation=Isotropy(
                            l2, length_scale=Parameter(1.0)
                        ),
                    ),
                    "noise": HomoscedasticNoise(1e-3),
                }
                for _ in range(2)
            )
        )
    layer = MultivariateMuyGPsLayer(muygps_model=mmodel)
    bi = np.arange(50)
    bni = rng.integers(0, 400, size=(50, 10))
    params = layer.init(
        jax.random.PRNGKey(0),
        jnp.asarray(xtr),
        jnp.asarray(bi),
        jnp.asarray(bni),
        jnp.asarray(y2)[bni],
    )
    mean, var = layer.apply(
        params, jnp.asarray(xtr), jnp.asarray(bi), jnp.asarray(bni),
        jnp.asarray(y2)[bni],
    )
    assert mean.shape == (50, 2)
    assert var.shape == (50, 2)
    assert np.all(np.isfinite(np.asarray(mean)))
    # two response heads own separate trainable length scales
    assert "response_0" in params["params"]
    assert "response_1" in params["params"]
