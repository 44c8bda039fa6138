"""Device-mesh management for multi-chip stencil execution.

This subsystem is NEW functionality relative to the reference: gt4py is
single-process and delegates distribution to consumers (GHEX/mpi4py in the
GridTools ecosystem — verified absent in the reference by grep, SURVEY.md
§2.6). The TPU-native design decomposes the horizontal IJ domain over a 2-D
``jax.sharding.Mesh`` whose axes ride the ICI torus; K stays on-chip
(sequential scans are a single-core loop).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


class CartesianMesh:
    """2-D (x, y) device mesh for IJ domain decomposition."""

    def __init__(self, devices: Optional[Sequence] = None, shape: Optional[tuple[int, int]] = None):
        if devices is None:
            devices = jax.devices()
        n = len(devices)
        if shape is None:
            shape = _factor2(n)
        if shape[0] * shape[1] != n:
            raise ValueError(f"Mesh shape {shape} does not match {n} devices")
        import numpy as np

        self.mesh = Mesh(np.asarray(devices).reshape(shape), axis_names=("x", "y"))
        self.shape = shape

    @property
    def nx(self) -> int:
        return self.shape[0]

    @property
    def ny(self) -> int:
        return self.shape[1]

    def sharding(self, spec: PartitionSpec = PartitionSpec("x", "y", None)) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def shard_ij(self, array):
        """Place a global (I, J, K) array sharded over the mesh."""
        return jax.device_put(array, self.sharding())


def _factor2(n: int) -> tuple[int, int]:
    """Most-square factorization of n (prefer balanced ICI traffic)."""
    best = (1, n)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best
