"""Guard: the suite must run on CPU with 8 virtual devices.

The axon TPU plugin can win an init race at interpreter boot; if it does,
every numeric tolerance in the suite silently degrades to tunnel/bf16
behavior. conftest.py clears and re-selects the backend — this test fails
loudly if that ever regresses.
"""

import jax


def test_backend_is_cpu():
    assert jax.default_backend() == "cpu", jax.default_backend()


def test_eight_virtual_devices():
    assert jax.device_count() >= 8, jax.devices()
