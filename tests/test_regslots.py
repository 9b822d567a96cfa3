"""Slot-kernel semantics parity (ops/regslots.py).

The TPU kernels are exercised under the Pallas interpreter on CPU so
their semantics (including the aliased not-written blocks keeping the
input value) are pinned without hardware; the XLA fallbacks are the
reference. Shapes mirror the executor's three register files:
rv [B, Nv, H], rf [B, Nf, F, H], ra [B, Na, F].
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stair_tpu.ops import regslots as R


FILES = [
    ("rv", (8, 5, 128)),
    ("rf", (8, 4, 16, 128)),
    ("ra", (8, 6, 16)),
]


def _data(shape, seed, dtype):
    rng = np.random.RandomState(seed)
    file = rng.randn(*shape).astype(np.float32)
    val = rng.randn(shape[0], *shape[2:]).astype(np.float32)
    idx = rng.randint(0, shape[1], (shape[0],)).astype(np.int32)
    return (jnp.asarray(file, dtype), jnp.asarray(val, dtype),
            jnp.asarray(idx))


@pytest.fixture()
def interpret(monkeypatch):
    monkeypatch.setattr(R, "_INTERPRET", True)


@pytest.mark.parametrize("name,shape", FILES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_slot_set_parity(interpret, name, shape, dtype):
    file, val, idx = _data(shape, 0, dtype)
    got = np.asarray(R._pallas_set(file, idx, val))
    want = np.asarray(R._xla_set(file, idx, val))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,shape", FILES)
def test_slot_zero_parity(interpret, name, shape):
    file, val, idx = _data(shape, 1, jnp.float32)
    got = np.asarray(R._pallas_zero(file, idx))
    want = np.asarray(R._xla_zero(file, idx))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,shape", FILES)
def test_slot_add_parity(interpret, name, shape):
    file, val, idx = _data(shape, 2, jnp.float32)
    got = np.asarray(R._pallas_add(file, idx, val))
    want = np.asarray(R._xla_add(file, idx, val))
    np.testing.assert_array_equal(got, want)


def test_public_entry_points_on_cpu():
    """slot_set/zero/add route to the XLA fallback off-TPU."""
    file, val, idx = _data((4, 3, 8, 128), 3, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(R.slot_set(file, idx, val)),
        np.asarray(R._xla_set(file, idx, val)),
    )
    np.testing.assert_array_equal(
        np.asarray(R.slot_zero(file, idx)),
        np.asarray(R._xla_zero(file, idx)),
    )
    np.testing.assert_array_equal(
        np.asarray(R.slot_add(file, idx, val)),
        np.asarray(R._xla_add(file, idx, val)),
    )
