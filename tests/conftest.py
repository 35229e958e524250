"""Test env: force CPU with 8 virtual devices so sharding/collective tests
run without TPU hardware. Must run before the first ``import jax``.

Set ``TIM_TPU_TEST_TPU=1`` to keep the real TPU backend instead — only
the TPU-gated tests (e.g. tests/test_flash_attention.py) are meant to
run that way; most golden tests assume CPU fp32 matmul precision."""

import os

if os.environ.get("TIM_TPU_TEST_TPU") == "1":
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets axon/tpu
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    # sitecustomize may have imported jax (axon TPU relay) before this
    # conftest ran, so the env vars above were read too late — force via
    # config.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_default_matmul_precision", "highest")
