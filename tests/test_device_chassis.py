"""On-device L-BFGS chassis conformance.

The device chassis runs the whole optimization trajectory in one compiled
``lax.while_loop`` program (muygpys_tpu/optimize/device_chassis.py); the
scipy-driven chassis is the oracle — both implement L-BFGS with the same
stopping semantics on the same objective, so the recovered hyperparameters
must agree to optimizer-tolerance (far tighter than the reference's
recovery tolerances, _test/optimize.py:37-49).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from muygpys_tpu._test.sampler import UnivariateSampler
from muygpys_tpu.gp import MuyGPS
from muygpys_tpu.gp.deformation import Isotropy, l2
from muygpys_tpu.gp.hyperparameter import AnalyticScale, Parameter
from muygpys_tpu.gp.kernels import Matern
from muygpys_tpu.gp.noise import HomoscedasticNoise
from muygpys_tpu.neighbors import NN_Wrapper
from muygpys_tpu.optimize import (
    Device_LBFGS_optimize,
    Fused_Device_LBFGS_optimize,
    L_BFGS_B_optimize,
    lool_fn,
    sample_batch,
)

TRUE_LS, NU = 0.05, 1.5


def _model(noise_free: bool = False):
    return MuyGPS(
        kernel=Matern(
            smoothness=Parameter(NU),
            deformation=Isotropy(
                l2, length_scale=Parameter(0.3, (0.01, 1.0))
            ),
        ),
        noise=HomoscedasticNoise(
            1e-3, bounds=(1e-6, 1e-1)
        ) if noise_free else HomoscedasticNoise(1e-3),
        scale=AnalyticScale(),
    )


@pytest.fixture(scope="module")
def problem(rng):
    """One synthetic GP draw + the scipy-chassis oracle optimum."""
    sampler = UnivariateSampler(
        data_count=500, train_ratio=0.5, nu=NU, length_scale=TRUE_LS,
        measurement_noise=1e-3, rng=rng,
    )
    xtr, _ = sampler.features()
    nbrs = NN_Wrapper(xtr, 25, nn_method="exact")
    ytr, _ = sampler.sample()
    bi, bni = sample_batch(nbrs, 128, xtr.shape[0], rng=rng)
    model = _model()
    tensors = model.make_train_tensors(
        bi, bni, jnp.asarray(xtr), jnp.asarray(ytr)
    )
    cw, pw, bt, bnt = tensors
    oracle = L_BFGS_B_optimize(model, bt, bnt, cw, pw, loss_fn=lool_fn)
    ls_oracle = float(oracle.kernel.deformation.length_scale())
    return model, tensors, ls_oracle


def test_fused_device_lbfgs_matches_scipy(problem):
    model, (cw, pw, bt, bnt), ls_oracle = problem
    opt = Fused_Device_LBFGS_optimize(
        model, bt, bnt, cw, pw, loss="lool", engine="lanes"
    )
    ls = float(opt.kernel.deformation.length_scale())
    assert np.isclose(ls, ls_oracle, rtol=1e-4), (ls, ls_oracle)


@pytest.mark.slow
def test_generic_device_lbfgs_matches_scipy(problem):
    model, (cw, pw, bt, bnt), ls_oracle = problem
    opt = Device_LBFGS_optimize(
        model, bt, bnt, cw, pw, loss_fn=lool_fn
    )
    ls = float(opt.kernel.deformation.length_scale())
    assert np.isclose(ls, ls_oracle, rtol=1e-4), (ls, ls_oracle)


@pytest.mark.slow
def test_fused_device_lbfgs_free_noise_in_bounds(problem):
    """Free noise: the bijector keeps every proposal inside the declared
    box, so the recovered nugget is structurally positive (r1 VERDICT
    missing #2 regression guard)."""
    _, (cw, pw, bt, bnt), _ = problem
    model = _model(noise_free=True)
    opt = Fused_Device_LBFGS_optimize(
        model, bt, bnt, cw, pw, loss="lool", engine="lanes"
    )
    ls = float(opt.kernel.deformation.length_scale())
    noise = float(opt.noise())
    assert 0.01 <= ls <= 1.0
    assert 1e-6 <= noise <= 1e-1
    assert np.isclose(ls, TRUE_LS, rtol=1.0)


@pytest.mark.slow
def test_pallas_engine_device_lbfgs(rng):
    """Lane-aligned batch (B=256): the fused Pallas value+grad kernel under
    the while_loop (interpret mode on CPU) agrees with the batched XLA
    engine's optimum."""
    sampler = UnivariateSampler(
        data_count=600, train_ratio=0.5, nu=NU, length_scale=TRUE_LS,
        measurement_noise=1e-3, rng=rng,
    )
    xtr, _ = sampler.features()
    nbrs = NN_Wrapper(xtr, 30, nn_method="exact")
    ytr, _ = sampler.sample()
    bi, bni = sample_batch(nbrs, 256, xtr.shape[0], rng=rng)
    model = _model()
    cw, pw, bt, bnt = model.make_train_tensors(
        bi, bni, jnp.asarray(xtr), jnp.asarray(ytr)
    )
    opt_xla = Fused_Device_LBFGS_optimize(
        model, bt, bnt, cw, pw, loss="lool", engine="lanes"
    )
    opt_pl = Fused_Device_LBFGS_optimize(
        model, bt, bnt, cw, pw, loss="lool", engine="pallas",
        interpret=True,
    )
    ls_xla = float(opt_xla.kernel.deformation.length_scale())
    ls_pl = float(opt_pl.kernel.deformation.length_scale())
    assert np.isclose(ls_pl, ls_xla, rtol=1e-3), (ls_pl, ls_xla)


def test_device_trainer_reuse_across_batches(problem, rng):
    """make_device_trainer: the batch tensors are traced ARGUMENTS, so a
    resampled batch reuses the compiled program (epoch-training shape);
    per-batch optima match the per-batch chassis."""
    from muygpys_tpu.optimize import make_device_trainer

    model, (cw, pw, bt, bnt), ls_oracle = problem
    trainer = make_device_trainer(model, loss="lool")

    trained1, info1 = trainer(bt, bnt, cw, pw)
    ls1 = float(trained1.kernel.deformation.length_scale())
    assert np.isclose(ls1, ls_oracle, rtol=1e-4), (ls1, ls_oracle)
    assert info1["iterations"] >= 1

    # a second, different batch: same shapes -> NO recompile
    sampler = UnivariateSampler(
        data_count=500, train_ratio=0.5, nu=NU, length_scale=TRUE_LS,
        measurement_noise=1e-3, rng=rng,
    )
    xtr, _ = sampler.features()
    ytr, _ = sampler.sample()
    nbrs = NN_Wrapper(xtr, 25, nn_method="exact")
    bi, bni = sample_batch(nbrs, 128, xtr.shape[0], rng=rng)
    cw2, pw2, bt2, bnt2 = model.make_train_tensors(
        bi, bni, jnp.asarray(xtr), jnp.asarray(ytr)
    )
    trained2, info2 = trainer(bt2, bnt2, cw2, pw2, z_init=info1["z"])
    assert trainer._jitted._cache_size() == 1, "second batch re-traced"
    ls2 = float(trained2.kernel.deformation.length_scale())
    assert np.isclose(ls2, TRUE_LS, rtol=1.0)


def test_device_trainer_shear_fallback(rng):
    """Model classes outside the fast objective (the shear family) epoch-
    train through the SAME compile-once device trainer via the generic
    composed objective (r4): full trajectory in one program, second epoch
    hits the cached executable."""
    from muygpys_tpu.gp.deformation import DifferenceIsotropy, F2
    from muygpys_tpu.gp.hyperparameter import FixedScale
    from muygpys_tpu.gp.kernels.experimental import ShearKernel
    from muygpys_tpu.gp.noise import ShearNoise33
    from muygpys_tpu.optimize.device_chassis import make_device_trainer

    pts = rng.uniform(size=(300, 2))
    kx = 2 * np.pi * np.array([2.0, 3.0])
    phase = pts @ kx
    targets = np.stack(
        [np.sin(phase), 0.4 * np.cos(phase), 0.3 * np.sin(2 * phase)], 1
    )
    ls0 = 0.1
    model = MuyGPS(
        kernel=ShearKernel(
            deformation=DifferenceIsotropy(
                F2, length_scale=Parameter(0.15, (0.02, 0.5))
            )
        ),
        noise=ShearNoise33(1e-3 * 2.0 / ls0**4),
        scale=FixedScale(),
    )
    nbrs = NN_Wrapper(pts, 10)
    bi = rng.choice(300, 64, replace=False)
    bni, _ = nbrs.get_batch_nns(bi)
    pw = model.kernel.deformation.pairwise_tensor(jnp.asarray(pts), bni)
    cw = model.kernel.deformation.crosswise_tensor(
        jnp.asarray(pts), jnp.asarray(pts), bi, bni
    )
    bt = jnp.asarray(targets[bi])
    bnt = jnp.asarray(targets[np.asarray(bni)].swapaxes(-2, -1))
    trainer = make_device_trainer(model, loss="mse")
    opt, info = trainer(bt, bnt, cw, pw)
    assert info["iterations"] > 0 and np.isfinite(info["value"])
    ls = float(opt.kernel.deformation.length_scale())
    assert 0.02 <= ls <= 0.5 and abs(ls - 0.15) > 1e-6
    # second epoch: cached executable, no re-trace
    opt2, _ = trainer(bt, bnt, cw, pw, z_init=info["z"])
    assert trainer._jitted._cache_size() == 1


def test_device_trainer_loss_registry(rng):
    """String losses outside the fast set resolve from the loss-module
    registry and train via the generic fallback (r4 review fix)."""
    from muygpys_tpu.optimize.device_chassis import make_device_trainer

    sampler = UnivariateSampler(
        data_count=300, train_ratio=0.5, nu=NU, length_scale=TRUE_LS,
        measurement_noise=1e-3, rng=rng,
    )
    xtr, _ = sampler.features()
    ytr, _ = sampler.sample()
    model = _model()
    nbrs = NN_Wrapper(xtr, 10, nn_method="exact")
    bi, bni = sample_batch(nbrs, 64, xtr.shape[0], rng=rng)
    cw, pw, bt, bnt = model.make_train_tensors(
        bi, bni, jnp.asarray(xtr), jnp.asarray(ytr)
    )
    trainer = make_device_trainer(model, loss="pseudo_huber")
    trained, info = trainer(bt, bnt, cw, pw)
    assert info["iterations"] > 0 and np.isfinite(info["value"])
    with pytest.raises(ValueError, match="no generic LossFn"):
        make_device_trainer(model, loss="nonsense")
