"""On-hardware regression suite config (round-5, VERDICT #6).

Unlike tests/conftest.py this does NOT force the CPU backend: these
tests exist precisely to run the Mosaic-COMPILED kernels on the
attached TPU (interpret mode is not the Mosaic compiler — the CPU suite
cannot catch Mosaic regressions). Tests skip themselves when no TPU is
attached.

Run on a TPU-attached machine:

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu -q

The default `pytest tests/` invocation never collects this directory.
"""

import os
import sys

# repo root + tools on sys.path (tools/ holds the validation functions
# these tests share with the artifact generator)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU attached (default backend is "
                    f"{jax.default_backend()!r})", allow_module_level=True)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
