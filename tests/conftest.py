"""Test configuration: force CPU with 8 virtual devices for multi-chip sharding
tests (SURVEY.md §4: the JAX analog of a fake backend).

The environment's TPU plugin overrides the platform via
``jax.config.update("jax_platforms", ...)`` at interpreter start, which takes
precedence over the JAX_PLATFORMS env var — so we must update the config again
here, before any backend is initialized.
"""
import os
import sys

# legacy-Keras shim BEFORE any tensorflow import: the TF-golden test drives
# the reference's Keras-2-era subclassed model (tests/test_tf_golden.py).
# oneDNN's Softmax kernel rejects the reference's 6-D convex-upsampling mask
# (upsample.py:23-24, "Input dims must be <= 5"); the eigen kernel takes it.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's big jits (semi-step backward, e2e CLI
# runs) are multi-minute XLA compiles on a 1-core host; reruns pay them once.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture()
def fake_root(tmp_path, monkeypatch):
    from flow_supervisor_tpu.data.synthetic import build_synthetic_tree

    root = tmp_path / "datasets"
    build_synthetic_tree(root)

    monkeypatch.setenv("FST_DATA_ROOT", str(root))
    import importlib
    from flow_supervisor_tpu.data import paths

    importlib.reload(paths)
    yield root
    importlib.reload(paths)


