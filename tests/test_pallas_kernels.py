"""Interpret-mode golden tests: Pallas kernels vs the jnp references."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_annotate_tpu.ops.orb import DESC_WORDS as DW, N_BITS as NB
from orb_slam2_annotate_tpu.ops import fast, hamming, pallas_kernels


def test_fast_kernel_matches_reference():
    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128) * 255).astype(np.float32)
    # add some strong corners
    for _ in range(30):
        y, x = rng.randint(10, 86), rng.randint(10, 118)
        img[y - 2:y + 3, x - 2:x + 3] = 255.0 * rng.rand()

    s_ref, hi_ref = fast.fast_score_map(jnp.asarray(img), 7.0, 20.0)
    s_pl, hi_pl = pallas_kernels.fast_score_map_pallas(
        jnp.asarray(img), 7.0, 20.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(hi_pl), np.asarray(hi_ref))


def test_fast_kernel_nondivisible_height():
    rng = np.random.RandomState(1)
    img = (rng.rand(100, 64) * 255).astype(np.float32)  # 100 % tile != 0
    s_ref, hi_ref = fast.fast_score_map(jnp.asarray(img), 7.0, 20.0)
    s_pl, hi_pl = pallas_kernels.fast_score_map_pallas(
        jnp.asarray(img), 7.0, 20.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(hi_pl), np.asarray(hi_ref))


def test_hamming_kernel_matches_reference():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 2**32, (200, DW), np.uint64).astype(np.uint32)
    b = rng.randint(0, 2**32, (176, DW), np.uint64).astype(np.uint32)
    ref = hamming.hamming_pairwise(jnp.asarray(a), jnp.asarray(b))
    out = pallas_kernels.hamming_pairwise_pallas(
        jnp.asarray(a), jnp.asarray(b), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
