"""TPU-native LISFLOOD framework.

The reference model is float64 end-to-end (prognostic state, Newton routing
solves to 1e-12; kinematic_wave_parallel_tools.py:26-28), so the framework
enables JAX x64 globally at import time. Compute-heavy inner kernels may
still downcast locally where tolerances allow.
"""
import jax as _jax

_jax.config.update("jax_enable_x64", True)
