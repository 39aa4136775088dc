"""Frontend tensor-assembly wrappers.

API parity: reference ``gp/tensors.py:23-153`` (``fast_nn_update``,
``make_fast_predict_tensors``, ``batch_features_tensor``,
``crosswise_tensor``, ``pairwise_tensor``, ``make_heteroscedastic_tensor``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from muygpys_tpu.ops import tensors as _t

fast_nn_update = _t.fast_nn_update
batch_features_tensor = _t.batch_features_tensor
make_heteroscedastic_tensor = _t.make_heteroscedastic_tensor
crosswise_tensor = _t.crosswise_diffs
pairwise_tensor = _t.pairwise_diffs


def make_fast_predict_tensors(
    batch_nn_indices: jnp.ndarray,
    train_features: jnp.ndarray,
    train_targets: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _t.make_fast_predict_tensors(
        batch_nn_indices, train_features, train_targets
    )
