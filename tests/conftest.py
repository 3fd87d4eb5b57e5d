"""Test harness: force a virtual 8-device CPU platform BEFORE jax import.

This is the 'multi-node without a cluster' strategy from SURVEY.md section 4:
all sharding/pjit tests run against 8 simulated devices so distributed
behaviour is covered in CI without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to the tunneled TPU; tests must
# run on the virtual 8-device CPU platform regardless.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Modules dominated by XLA:CPU compiles of the big fused programs (full
# train steps, jitted sampling scans, fused raster+VAE+train) — the full
# suite costs ~47 min on the 1-core host, almost all of it here.  Everything
# else is auto-marked `quick`; `pytest -m quick` is the <5-min smoke.
_SLOW_MODULES = {
    "test_eval_quality", "test_legacy_pipelines", "test_parallel_train",
    "test_pipeline", "test_render_in_step", "test_samplers",
    "test_scene_bank", "test_sd_port_e2e", "test_trainer",
    "test_training_learns", "test_vae_train", "test_validation",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__
        item.add_marker(pytest.mark.slow if name in _SLOW_MODULES
                        else pytest.mark.quick)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
