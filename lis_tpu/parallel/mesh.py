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
    return mesh.shape[AXIS]
