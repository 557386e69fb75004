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


def test_surrogate_never_harmful_on_pure_noise():
    """Never-harmful contract (round-3 full-field audit): when the target is
    iid noise — nothing generalizes — best-validation-snapshot selection
    anchored at the constant-mean predictor must deploy (approximately) the
    anchor, so the correction cannot be worse out-of-sample than predicting
    the dataset mean. A final-params deployment memorizes the train split and
    INCREASES fresh-sample error (measured on the 64-dim full-field case)."""
    key = jax.random.PRNGKey(3)
    kx, ky, kh = jax.random.split(key, 3)
    x = jax.random.normal(kx, (512, 64))
    y = 0.3 + 0.01 * jax.random.normal(ky, (512, 3))  # mean 0.3, pure noise
    model, _ = train_surrogate(x, y, hidden=(64, 64), steps=2000, seed=0)
    x_fresh = jax.random.normal(kh, (256, 64))
    pred = jax.vmap(model.predict)(x_fresh)
    # the anchor predicts exactly y_mean; allow a best-val snapshot that
    # beats the anchor on the val split to deviate a little, but it must
    # stay at the noise floor, not at a memorized net's out-of-sample error
    resid = float(jnp.sqrt(jnp.mean((pred - 0.3) ** 2)))
    assert resid < 0.02, resid


def test_surrogate_valfrac_zero_returns_final_params():
    """val_frac=0 must still train (degenerate split validates on train)."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (256, 5))
    y = x * 1.5
    model, losses = train_surrogate(x, y, hidden=(32,), steps=2000, lr=3e-3, val_frac=0.0)
    pred = jax.vmap(model.predict)(x)
    rel = float(jnp.linalg.norm(pred - y) / jnp.linalg.norm(y))
    assert rel < 0.1, rel
