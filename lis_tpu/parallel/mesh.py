"""Device-mesh helpers — the TPU replacement for MPI communicators.

The reference's process model (ranks + MPI_COMM_WORLD, lis_initialize
src/system/lis_init.c) maps to a 1-D ``jax.sharding.Mesh`` over all chips:
the mesh axis "p" plays the role of the communicator, ``psum``/
``all_gather``/``psum_scatter`` over it replace MPI_Allreduce /
Isend-Irecv halo exchange / transpose-reduce.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

AXIS = "p"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the first n_devices (default all) jax devices;
    the axis name is AXIS ("p") — the MPI_Comm analogue."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}) but only {len(devs)} JAX device(s) "
                "are visible; for a virtual CPU mesh set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "JAX_PLATFORMS=cpu before JAX initializes its backends")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def nprocs(mesh: Mesh) -> int:
    """Device count along the distribution axis (MPI_Comm_size analogue)."""
    return mesh.shape[AXIS]


def ensure_devices(n: int) -> int:
    """Make sure at least n JAX devices are visible, re-initializing a
    virtual CPU backend if needed (some sitecustomize setups rewrite
    XLA_FLAGS at interpreter start, losing
    --xla_force_host_platform_device_count).  Returns the visible device
    count; raises if n cannot be provisioned."""
    import os
    if len(jax.devices()) >= n:
        return len(jax.devices())
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n}")
    try:
        from jax._src import xla_bridge as _xb
        _xb._backends.clear()
        _xb._backend_errors.clear()
        _xb._default_backend = None
        jax.clear_caches()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass
    got = len(jax.devices())
    if got < n:
        raise RuntimeError(f"cannot provision {n} devices (have {got})")
    return got
