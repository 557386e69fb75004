"""NN error-surrogate tests (SURVEY.md §4 'NN surrogate' row)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesianinferencedl_tpu.models.surrogate import MLP, train_surrogate


def test_mlp_shapes():
    mlp = MLP(sizes=(5, 32, 32, 5), activation="tanh")
    params = mlp.init(jax.random.PRNGKey(0))
    y = mlp.apply(params, jnp.ones((7, 5)))
    assert y.shape == (7, 5)
    y1 = mlp.apply(params, jnp.ones(5))
    assert y1.shape == (5,)


def test_surrogate_fits_smooth_function():
    """The surrogate must fit a smooth low-dim map well (the ROM error is
    such a map); also checks the loss decreases."""
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (2048, 5), minval=-2.0, maxval=2.0)
    y = jnp.stack(
        [
            jnp.sin(x[:, 0]) * x[:, 1],
            jnp.exp(-x[:, 2] ** 2),
            x[:, 3] * x[:, 4],
            jnp.cos(x.sum(1)),
            x[:, 0] ** 2 * 0.1,
        ],
        axis=1,
    )
    model, losses = train_surrogate(x, y, hidden=(64, 64), steps=3000, seed=0, lr=3e-3)
    assert float(losses[-100:].mean()) < float(losses[:100].mean()) * 0.05
    pred = jax.vmap(model.predict)(x[:256])
    rel = float(jnp.linalg.norm(pred - y[:256]) / jnp.linalg.norm(y[:256]))
    assert rel < 0.15, rel


def test_surrogate_gradients_flow():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (128, 5))
    y = x[:, :5] * 2.0
    model, _ = train_surrogate(x, y, hidden=(16,), steps=200)
    g = jax.grad(lambda t: jnp.sum(model.predict(t)))(jnp.zeros(5))
    assert np.isfinite(np.asarray(g)).all()
