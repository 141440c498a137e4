"""helib_tpu — a TPU-native homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of homenc/HElib
(BGV + CKKS, packed SIMD arithmetic, rotations, key/modulus switching,
bootstrapping, and the surrounding algorithm library).  See SURVEY.md for the
structural map to the reference and the design departures taken for TPU.
"""

import jax

# 64-bit integer support: device modular arithmetic uses uint64 intermediates
# (emulated as 32-bit pairs on TPU); host-side exact math uses numpy int64.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .nt.numbth import factorize, phi_n, mult_order, find_generators  # noqa: E402,F401
