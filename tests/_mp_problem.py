"""Shared synthetic problem for the multi-process test: every process (and
the serial oracle) builds the identical model + training-batch tensors from
a fixed seed — the JAX analogue of the reference broadcasting sampled state
(``gp/hyperparameter/scalar.py:145-147``)."""

import numpy as np


def build_problem(batch=64):
    import jax.numpy as jnp

    from muygpys_tpu.gp import MuyGPS
    from muygpys_tpu.gp.deformation import Isotropy, l2
    from muygpys_tpu.gp.hyperparameter import AnalyticScale, Parameter
    from muygpys_tpu.gp.kernels import Matern
    from muygpys_tpu.gp.noise import HomoscedasticNoise

    rng = np.random.default_rng(1234)
    train_count, nn = 256, 10
    xtr = rng.uniform(size=(train_count, 2))
    ytr = rng.standard_normal((train_count, 1))
    bi = rng.choice(train_count, batch, replace=False)
    bni = np.stack(
        [rng.choice(train_count, nn, replace=False) for _ in range(batch)]
    )

    model = MuyGPS(
        kernel=Matern(
            smoothness=Parameter(1.5),
            deformation=Isotropy(
                l2, length_scale=Parameter(0.7, (0.05, 5.0))
            ),
        ),
        noise=HomoscedasticNoise(2e-3, (1e-5, 1e-1)),
        scale=AnalyticScale(),
    )
    tensors = model.make_train_tensors(
        bi, bni, jnp.asarray(xtr), jnp.asarray(ytr)
    )
    return model, tensors
