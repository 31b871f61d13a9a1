import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.ops.morton import morton3d, morton3d_invert, packbits, unpackbits


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.integers(0, 1024, (100, 3)), jnp.uint32)
    codes = morton3d(coords)
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))


def test_morton_known_values():
    # (1,0,0)->1, (0,1,0)->2, (0,0,1)->4, (1,1,1)->7
    coords = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1], [2, 0, 0]])
    codes = np.asarray(morton3d(coords))
    np.testing.assert_array_equal(codes, [1, 2, 4, 7, 8])


def test_morton_locality():
    """Adjacent cells differ in few bits — codes are dense within octants."""
    c = np.asarray(morton3d(jnp.asarray([[0, 0, 0], [1, 1, 1]])))
    assert c[0] == 0 and c[1] == 7


def test_packbits_roundtrip():
    rng = np.random.default_rng(1)
    occ = jnp.asarray(rng.random((4, 64)) > 0.5, jnp.float32)
    packed = packbits(occ)
    assert packed.shape == (4, 8)
    assert packed.dtype == jnp.uint8
    unpacked = unpackbits(packed)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(occ) > 0)


def test_packbits_bit_order():
    # only cell 3 occupied -> byte 0 == 8 (LSB-first)
    occ = jnp.zeros((8,)).at[3].set(1.0)
    assert int(packbits(occ)[0]) == 8
