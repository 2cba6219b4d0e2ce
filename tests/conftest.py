"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding
logic is tested without TPU hardware, per SURVEY.md §4 plan (d))."""

import os

# must run before jax initializes any backend; force-set — the machine may
# preset JAX_PLATFORMS to a TPU tunnel backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a sitecustomize hook may have force-registered a TPU tunnel backend and
# overridden jax_platforms to "axon,cpu"; pin it back before backends init
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent XLA cache (same one the predictor/solver entry points use):
# the suite's many fixed-shape test programs compile once per code change,
# not once per run — the dominant cost of a warm suite invocation
from ctpn_tpu.utils.compilation import ensure_compilation_cache  # noqa: E402

ensure_compilation_cache(min_compile_secs=0.0)

# build the native host library if missing so its parity tests run instead
# of silently skipping (a toolchain-less box still skips gracefully)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_REPO, "native", "libctpn_host.so")):
    import shutil
    import subprocess

    if shutil.which("make") and shutil.which("g++"):
        subprocess.run(
            ["make", "-C", os.path.join(_REPO, "native")],
            capture_output=True,
            timeout=120,
            check=False,
        )


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # cfg.RNG_SEED default


@pytest.fixture(autouse=True)
def _fresh_cfg():
    """Isolate config mutations between tests."""
    from ctpn_tpu.config import reset_cfg

    reset_cfg()
    yield
    reset_cfg()


def random_boxes(rng, n, im_h=600, im_w=900, max_wh=150):
    """(n, 4) well-formed float32 boxes inside an image."""
    x1 = rng.uniform(0, im_w - 2, n)
    y1 = rng.uniform(0, im_h - 2, n)
    w = rng.uniform(1, max_wh, n)
    h = rng.uniform(1, max_wh, n)
    x2 = np.minimum(x1 + w, im_w - 1)
    y2 = np.minimum(y1 + h, im_h - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
