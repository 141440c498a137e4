"""helib_tpu — a TPU-native homomorphic-encryption framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of homenc/HElib
(BGV + CKKS, packed SIMD arithmetic, rotations, key/modulus switching,
bootstrapping, and the surrounding algorithm library).  See SURVEY.md for the
structural map to the reference and the design departures taken for TPU.
"""

import os

import jax

# 64-bit integer support: device modular arithmetic uses uint64 intermediates
# (emulated as 32-bit pairs on TPU); host-side exact math uses numpy int64.
jax.config.update("jax_enable_x64", True)

# Test/CI hook: some TPU plugins register even under JAX_PLATFORMS=cpu;
# HELIB_FORCE_CPU pins the default device to the host CPU.
if os.environ.get("HELIB_FORCE_CPU"):
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass

# Persistent compilation cache: first-compile of the NTT/pipeline graphs is
# expensive over the TPU tunnel; subsequent process launches reuse it.
_cache_dir = os.environ.get("HELIB_TPU_XLA_CACHE",
                            os.path.expanduser("~/.cache/helib_tpu_xla"))
# CPU-backend processes (tests, dryruns) get a host-feature-keyed cache
# directory: XLA:CPU AOT executables compiled on an earlier round's host
# with different vector extensions SIGILL/segfault when replayed here (the
# cpu_aot_loader "machine features don't match" warning is not benign — a
# round-5 full-suite worker died exactly this way).  TPU executables are
# device-side and host-independent, so the shared dir stays for them.
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        import hashlib
        with open("/proc/cpuinfo") as _f:
            _flags = [ln for ln in _f if ln.startswith("flags")][:1]
        _hostkey = hashlib.sha1("".join(_flags).encode()).hexdigest()[:12]
        _cache_dir = f"{_cache_dir}_cpu_{_hostkey}"
    except Exception:
        _cache_dir = _cache_dir + "_cpu"
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # persist even the small per-shape programs: setup paths dispatch many
    # ~0.3-0.9 s compiles whose aggregate dominates Context/keygen latency
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
except Exception:  # cache is an optimization only
    pass

__version__ = "0.1.0"

from .nt.numbth import factorize, phi_n, mult_order, find_generators  # noqa: E402,F401
