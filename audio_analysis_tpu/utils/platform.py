"""Honor an explicit platform override for CLI runs.

``AA_PLATFORM=cpu python -m analyse.cli ...`` pins jax to the named
platform(s) before the first backend initialisation. This exists because
the plain ``JAX_PLATFORMS`` env var is not reliable under accelerator
plugins that re-pin ``jax_platforms`` from an interpreter-startup hook
(observed in the axon dev environment: the hook forces "axon,cpu" after
env processing, so ``JAX_PLATFORMS=cpu`` still initialises — and, with
the accelerator pool unreachable, hangs on — the TPU client). A
``jax.config.update`` issued after the hook but before the first jax op
wins, making host-only CLI runs hermetic by construction, exactly like
``__graft_entry__.dryrun_multichip``.

No reference analogue (the reference is host-only; SURVEY §5 config row).
"""

from __future__ import annotations

import os


def pin_platform(value: str) -> bool:
    """Pin ``jax_platforms`` to ``value`` (e.g. "cpu") for this process.

    Must run before the first jax operation; importing jax is fine. This
    is the only pin that sticks under the axon startup hook — setting
    ``JAX_PLATFORMS`` in ``os.environ`` is processed before the hook
    re-pins and is therefore ignored. Returns False if the pin could not
    be applied (backends already initialised).
    """
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except Exception:
        return False
    return True


def apply_platform_override(env_var: str = "AA_PLATFORM") -> str | None:
    """If ``env_var`` is set, pin ``jax_platforms`` to its value.

    Call at CLI-main entry, before any jax operation (importing jax is
    fine — only backend *initialisation* latches the platform list).
    Returns the applied value, or None when the variable is unset or the
    pin could not be applied (already-initialised backends).
    """
    value = os.environ.get(env_var, "").strip()
    if not value:
        return None
    return value if pin_platform(value) else None
