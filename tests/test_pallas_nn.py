import numpy as np
import jax.numpy as jnp

from fastliosam_tpu.ops import nearest_neighbors_pallas


def test_pallas_nn_matches_bruteforce(rng):
    src = rng.normal(size=(300, 3)).astype(np.float32)
    dst = (rng.normal(size=(2500, 3)) * 2).astype(np.float32)
    mask = np.ones(2500, bool)
    mask[100:200] = False
    idx, d2 = nearest_neighbors_pallas(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), interpret=True
    )
    dd = ((src[:, None] - dst[None]) ** 2).sum(-1)
    dd[:, ~mask] = 1e12
    np.testing.assert_array_equal(np.asarray(idx), dd.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), dd.min(1), atol=1e-4)


def test_pallas_nn_all_masked(rng):
    src = rng.normal(size=(64, 3)).astype(np.float32)
    dst = rng.normal(size=(256, 3)).astype(np.float32)
    mask = np.zeros(256, bool)
    idx, d2 = nearest_neighbors_pallas(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), interpret=True
    )
    assert np.all(np.asarray(d2) > 1e10)
