import jax
import jax.numpy as jnp
import numpy as np

from nerfnav_tpu.ops import mape_loss, huber_loss, eff_distloss


def test_mape_basic():
    pred = jnp.array([1.1, 2.0])
    target = jnp.array([1.0, 2.0])
    loss = float(mape_loss(pred, target))
    expected = np.mean([0.1 / 1.01, 0.0])
    np.testing.assert_allclose(loss, expected, rtol=1e-4)


def test_huber_regions():
    pred = jnp.array([0.05, 1.0])
    target = jnp.array([0.0, 0.0])
    loss = np.asarray(huber_loss(pred, target, delta=0.1, reduction="none"))
    # |e|<=delta: quadratic 0.5/delta*e^2 ; else linear |e|-0.5*delta
    np.testing.assert_allclose(loss[0], 0.5 / 0.1 * 0.05**2, rtol=1e-5)
    np.testing.assert_allclose(loss[1], 1.0 - 0.05, rtol=1e-5)


def test_eff_distloss_matches_n2():
    """O(N) prefix-sum form == naive O(N^2) double sum."""
    key = jax.random.PRNGKey(0)
    w = jax.nn.softmax(jax.random.normal(key, (4, 16)))
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (4, 16)), axis=-1)
    interval = 1.0 / 16

    fast = float(eff_distloss(w, t, interval))
    wn, tn = np.asarray(w), np.asarray(t)
    naive = 0.0
    for b in range(4):
        cross = np.sum(
            wn[b][:, None] * wn[b][None, :] * np.abs(tn[b][:, None] - tn[b][None, :])
        )
        naive += cross + np.sum(wn[b] ** 2 * interval) / 3.0
    naive /= 4
    np.testing.assert_allclose(fast, naive, rtol=1e-4)


def test_eff_distloss_grad_finite():
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 8)))
    t = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (2, 8)), axis=-1)
    g = jax.grad(lambda ww: eff_distloss(ww, t, 0.125))(w)
    assert np.all(np.isfinite(np.asarray(g)))
