"""core/ utilities: digit math vs the reference GET_R_BITS semantics."""
import numpy as np
import pytest
import jax.numpy as jnp

from lsdradixsort_tpu.core import digits, datagen, roofline


@pytest.mark.parametrize("r", [1, 2, 4, 8, 16])
def test_get_digit_matches_numpy(rng, r):
    keys = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    for g in range(digits.num_digit_groups(r)):
        got = np.asarray(digits.get_digit(jnp.asarray(keys), r, g))
        want = digits.get_digit_np(keys, r, g)
        np.testing.assert_array_equal(got, want.astype(np.int32))


def test_num_digit_groups():
    assert digits.num_digit_groups(8) == 4
    assert digits.num_digit_groups(1) == 32
    assert digits.num_digit_groups(5) == 7  # ceil(32/5)
    with pytest.raises(ValueError):
        digits.num_digit_groups(0)


def test_datagen_deterministic():
    a = np.asarray(datagen.random_keys(1000, seed=3))
    b = np.asarray(datagen.random_keys(1000, seed=3))
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint32


def test_datagen_bounded():
    a = np.asarray(datagen.random_keys_bounded(1000, 10, 20, seed=1))
    assert a.min() >= 10 and a.max() < 20


def test_skewed_keys():
    a = np.asarray(datagen.skewed_keys(10_000, hot_fraction=0.9))
    assert np.mean(a == np.uint32(0xDEADBEEF)) > 0.85


def test_roofline_model():
    rl = roofline.Roofline("TPU v5 lite", 819.0)
    assert rl.light_speed_s(819e9) == pytest.approx(1.0)
    assert rl.fraction(819e9, 2.0) == pytest.approx(0.5)
    # one 8-bit pass on keys-only: read for hist + read + write = 12 B/elem
    assert roofline.sort_pass_bytes(100, 4, 0) == 1200
    assert roofline.sort_bytes(100, 8, 4, 0) == 4 * 1200
