"""Weight initializers (fillers).

Distribution semantics mirror bcnn_tensor_fill (src/bcnn_tensor.c:47-77):
  XAVIER: uniform(-sqrt(3/range), +sqrt(3/range))
  MSRA:   normal(0, sqrt(2/range))
  FIXED:  constant
where `range` is the fan-in chosen by each layer builder (e.g. k*k*c_per_group
for conv, input_size for fully-connected).

The reference uses libc rand(); we use JAX's counter-based PRNG instead —
same distributions, reproducible and splittable on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .types import FillerType


@dataclass(frozen=True)
class Filler:
    type: FillerType
    range: float = 1.0
    value: float = 0.0

    def __call__(self, key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        if self.type == FillerType.XAVIER:
            std = math.sqrt(3.0 / self.range)
            return jax.random.uniform(
                key, shape, jnp.float32, minval=-std, maxval=std
            )
        if self.type == FillerType.MSRA:
            std = math.sqrt(2.0 / self.range)
            return std * jax.random.normal(key, shape, jnp.float32)
        return jnp.full(shape, self.value, jnp.float32)


def zeros(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    del key
    return jnp.zeros(shape, jnp.float32)


def ones(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    del key
    return jnp.ones(shape, jnp.float32)
