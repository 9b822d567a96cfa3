"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip hardware is not required to test sharding: XLA's host platform can
expose N virtual CPU devices, which is how every pjit/shard_map test here
validates its multi-device behavior.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest

# The axon TPU plugin ignores JAX_PLATFORMS, so pin the default device to the
# virtual CPU fleet explicitly (tests must not depend on the tunneled chip).
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


def have_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference's pure-Python program layer for golden
    parity checks. Skips when the reference checkout is absent."""
    if not have_reference():
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # The reference imports nltk stopwords at module scope; stub the corpus
    # lookup so import works without downloaded nltk data.
    import nltk.corpus

    class _EmptyStopwords:
        def words(self, lang):
            return []

    try:
        nltk.corpus.stopwords.words("english")
    except Exception:
        nltk.corpus.stopwords = _EmptyStopwords()

    from utils import program_parser as ref_parser
    from utils import scene_graphs as ref_sg

    return {"parser": ref_parser, "scene_graphs": ref_sg}


@pytest.fixture(scope="session")
def synthetic_world(tmp_path_factory):
    """A small synthetic AGQA-format corpus shared across the test session."""
    from stair_tpu.testing.synthetic import make_world

    out = tmp_path_factory.mktemp("world")
    return make_world(str(out), num_videos=8, questions_per_video=6, seed=7)
