"""Runtime configuration for muygpys_tpu.

TPU-first replacement for the reference's config machinery
(``/root/reference/src/MuyGPyS/_src/config.py``): a single JAX backend, so no
backend dispatch is needed.  The only global knobs are float width and the
default device platform.

Environment variables (read once at import):

- ``MUYGPYS_FTYPE``: ``"32"`` (default) or ``"64"``.  ``"64"`` flips on
  ``jax_enable_x64`` so every array constructor and solver runs in double
  precision.  On TPU hardware f64 is emulated and slow; it exists for
  conformance testing against the reference numpy semantics
  (reference README.md:162-172 documents up-to-1e-2 f32/f64 solve drift).

Distance matmuls always run at ``jax.lax.Precision.HIGHEST`` regardless of
ftype (see README "Float-width policy").
"""

from __future__ import annotations

import dataclasses
import os


def _env_ftype() -> int:
    val = os.environ.get("MUYGPYS_FTYPE", "32").strip()
    if val not in ("32", "64"):
        raise ValueError(f"MUYGPYS_FTYPE must be '32' or '64', got {val!r}")
    return int(val)


@dataclasses.dataclass
class _State:
    ftype: int = 32


state = _State(ftype=_env_ftype())

if state.ftype == 64:
    import jax

    jax.config.update("jax_enable_x64", True)


def update(key: str, value) -> None:
    """Programmatic config update, e.g. ``config.update("ftype", 64)``.

    Mirrors the reference's ``config.update("muygpys_ftype", ...)`` surface
    (reference README.md:139-146) without the vendored 870-LoC config object.
    """
    import jax

    if key in ("ftype", "muygpys_ftype"):
        value = int(value)
        if value not in (32, 64):
            raise ValueError(f"ftype must be 32 or 64, got {value}")
        state.ftype = value
        jax.config.update("jax_enable_x64", value == 64)
    else:
        raise ValueError(f"unknown config key {key!r}")


def ftype():
    """The current default float dtype (tracks ``jax_enable_x64``)."""
    import jax.numpy as jnp

    return jnp.float64 if state.ftype == 64 else jnp.float32


def itype():
    import jax.numpy as jnp

    return jnp.int32


def parse_flags(argv=None):
    """Consume ``--muygpys_*`` command-line flags (reference parity with the
    absl integration, reference _src/config.py:23-39).

    Recognized: ``--muygpys_ftype={32,64}``.  Returns the remaining argv.
    """
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    remaining = []
    for arg in args:
        if arg.startswith("--muygpys_ftype"):
            val = arg.split("=", 1)[1] if "=" in arg else None
            if val is None:
                raise ValueError("--muygpys_ftype requires =32 or =64")
            update("ftype", val)
        elif arg.startswith("--muygpys_"):
            raise ValueError(f"unknown flag {arg.split('=')[0]!r}")
        else:
            remaining.append(arg)
    return remaining
