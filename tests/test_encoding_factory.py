import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.models.encoding import get_encoder


def test_none():
    init, enc, dim = get_encoder(None, input_dim=3)
    assert init is None and dim == 3
    x = jnp.ones((4, 3))
    np.testing.assert_allclose(np.asarray(enc(None, x)), np.asarray(x))


def test_frequency():
    init, enc, dim = get_encoder("frequency", input_dim=3, multires=6)
    assert init is None and dim == 3 * (1 + 12)
    assert enc(None, jnp.ones((2, 3))).shape == (2, dim)


def test_sphere_harmonics():
    init, enc, dim = get_encoder("sphere_harmonics", degree=4)
    assert dim == 16
    d = jnp.array([[0.0, 0.0, 1.0]])
    assert enc(None, d).shape == (1, 16)


def test_hashgrid():
    init, enc, dim = get_encoder(
        "hashgrid", num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=8, desired_resolution=32,
    )
    assert dim == 8
    table = init(jax.random.PRNGKey(0))
    out = enc(table, jnp.zeros((5, 3)))
    assert out.shape == (5, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unknown_raises():
    import pytest

    with pytest.raises(ValueError):
        get_encoder("nonsense")
