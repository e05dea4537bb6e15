"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The environment pre-imports JAX (sitecustomize) with JAX_PLATFORMS=axon, so
env vars alone are not enough — we must update the config post-import, before
any backend initializes.

Set FASTERGS_TPU_TESTS=1 to keep the real TPU backend instead (for the
`-m tpu` on-device kernel-regression tier); the CPU-mesh tests are skipped
in that mode via their device-count requirements.
"""

import os

_ON_TPU = os.environ.get('FASTERGS_TPU_TESTS', '') == '1'

if not _ON_TPU:
    # Read by the CPU backend at first initialization (still pending here).
    xla_flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in xla_flags:
        os.environ['XLA_FLAGS'] = (
            xla_flags + ' --xla_force_host_platform_device_count=8').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update('jax_platforms', 'cpu')
else:
    # the -m tpu tier compiles real Mosaic kernels through a tunneled
    # backend; the persistent cache makes reruns fast (bench.py does the same)
    from fastergs_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
jax.config.update('jax_enable_x64', False)
