"""Pure-JAX MLP error surrogate + in-repo Adam (SURVEY.md §7 stage 4).

Rebuilds the reference's Keras `dl_model.py` MLP (SURVEY.md §2a #7) as an
`init`/`apply` pair of pure functions with a jitted scan-based training loop.
The network maps conductivity parameters (in log space, which matches the
prior's coordinates) to the QoI-space ROM error e(k) = y_FOM(k) - y_ROM(k).

The model is intentionally dependency-free (no flax/optax) so the framework's
inference hot loop — where `apply` is fused into the pCN chain step — has no
external layers between it and XLA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
}


class MLP(NamedTuple):
    """Hyperparameters; params are a separate pytree (list of (W, b))."""

    sizes: tuple  # (in, hidden..., out)
    activation: str = "tanh"

    def init(self, key: jax.Array, dtype=jnp.float32):
        params = []
        for din, dout in zip(self.sizes[:-1], self.sizes[1:]):
            key, sub = jax.random.split(key)
            W = jax.random.normal(sub, (din, dout), dtype) * jnp.sqrt(2.0 / din).astype(dtype)
            params.append((W, jnp.zeros((dout,), dtype)))
        return params

    def apply(self, params, x: jax.Array) -> jax.Array:
        # full-f32 matmuls: the surrogate predicts QoI-scale corrections
        # (~1e-3 absolute), below bfloat16 MXU resolution, and the matrices
        # are tiny anyway (TPU matmul default would be bf16 passes).
        hi = jax.lax.Precision.HIGHEST
        act = _ACTIVATIONS[self.activation]
        h = x
        for W, b in params[:-1]:
            h = act(jnp.dot(h, W, precision=hi) + b)
        W, b = params[-1]
        return jnp.dot(h, W, precision=hi) + b


class AdamState(NamedTuple):
    step: jax.Array
    mu: list
    nu: list


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(jnp.zeros((), jnp.int32), zeros, jax.tree.map(jnp.zeros_like, params))


def adam_update(params, grads, state: AdamState, lr, b1=0.9, b2=0.999, eps=1e-8):
    step = state.step + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    t = step.astype(jnp.float32)
    scale = lr * jnp.sqrt(1 - b2**t) / (1 - b1**t)
    params = jax.tree.map(
        lambda p, m, v: p - scale * m / (jnp.sqrt(v) + eps), params, mu, nu
    )
    return params, AdamState(step, mu, nu)


class Normalizer(NamedTuple):
    """Affine input/output normalization baked into the saved surrogate."""

    x_mean: jax.Array
    x_std: jax.Array
    y_mean: jax.Array
    y_std: jax.Array

    @classmethod
    def fit(cls, x, y):
        return cls(
            x_mean=x.mean(0),
            x_std=x.std(0) + 1e-8,
            y_mean=y.mean(0),
            y_std=y.std(0) + 1e-8,
        )


class TrainedSurrogate(NamedTuple):
    mlp: MLP
    params: list
    norm: Normalizer

    def predict(self, log_k: jax.Array) -> jax.Array:
        """NN error prediction e_hat(k) from log-conductivity input."""
        x = (log_k - self.norm.x_mean) / self.norm.x_std
        y = self.mlp.apply(self.params, x)
        return y * self.norm.y_std + self.norm.y_mean


@partial(jax.jit, static_argnames=("mlp", "batch_size", "steps", "n_val"))
def _train_loop(mlp: MLP, params, norm, x, y, key, lr, batch_size: int, steps: int,
                n_val: int):
    n = x.shape[0] - n_val
    xn = (x - norm.x_mean) / norm.x_std
    yn = (y - norm.y_mean) / norm.y_std
    # rows are iid draws, so the tail split is an unbiased validation set
    x_tr, y_tr = xn[:n], yn[:n]
    x_val, y_val = xn[n:], yn[n:]

    def loss_fn(p, xb, yb):
        pred = mlp.apply(p, xb)
        return jnp.mean((pred - yb) ** 2)

    def step(carry, key_t):
        p, opt, best_p, best_val = carry
        idx = jax.random.randint(key_t, (batch_size,), 0, n)
        l, g = jax.value_and_grad(loss_fn)(p, x_tr[idx], y_tr[idx])
        p, opt = adam_update(p, g, opt, lr)
        # best-validation-snapshot selection: a surrogate that memorizes
        # (high-dim inputs, thin data) keeps improving the train loss while
        # the val loss turns around — deploying the best-val params bounds
        # the out-of-sample correction at its best generalizing state
        # (measured: the 64-dim full-field NN fits train to 3e-8 while the
        # HOLDOUT corrected error sits ABOVE the raw ROM error)
        val = loss_fn(p, x_val, y_val)
        better = val < best_val
        best_p = jax.tree.map(
            lambda b, cur: jnp.where(better, cur, b), best_p, p
        )
        best_val = jnp.where(better, val, best_val)
        return (p, opt, best_p, best_val), l

    keys = jax.random.split(key, steps)
    # anchor the selection with the CONSTANT-MEAN predictor (last layer
    # zeroed => predict() returns y_mean): the deployed surrogate can then
    # never validate worse than "no pointwise correction" — on problems
    # where nothing generalizes (64-dim full-field, measured) training ends
    # at the anchor instead of a memorized net
    zero_last = params[:-1] + [
        (jnp.zeros_like(params[-1][0]), jnp.zeros_like(params[-1][1]))
    ]
    val0 = loss_fn(zero_last, x_val, y_val)
    init = (params, adam_init(params), zero_last, val0)
    (params, _, best_params, best_val), losses = jax.lax.scan(step, init, keys)
    return best_params, losses, best_val


def train_surrogate(
    log_ks: jax.Array,
    errors: jax.Array,
    *,
    hidden: Sequence[int] = (64, 64),
    activation: str = "tanh",
    lr: float = 1e-3,
    batch_size: int = 128,
    steps: int = 5000,
    seed: int = 0,
    val_frac: float = 0.1,
) -> tuple[TrainedSurrogate, jax.Array]:
    """Train the ROM-error surrogate on (log k, e) pairs. Returns the trained
    model and the per-step TRAINING loss curve.

    The last ``val_frac`` of the rows (iid draws) is held out as a
    validation split, and the returned params are the best-validation
    snapshot over the run — so the deployed surrogate is its best
    GENERALIZING state, never the final (possibly memorized) one. Set
    val_frac=0 to disable (returns the final params)."""
    dtype = log_ks.dtype
    mlp = MLP(sizes=(log_ks.shape[1], *hidden, errors.shape[1]), activation=activation)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params = mlp.init(init_key, dtype=dtype)
    norm = Normalizer.fit(log_ks, errors)
    n_val = int(val_frac * log_ks.shape[0])
    if n_val == 0:
        # degenerate split: validate on the training rows (plain final-params
        # behavior would hide divergence; best-train is still well-defined)
        n_val_eff = log_ks.shape[0]
        x = jnp.concatenate([log_ks, log_ks])
        y = jnp.concatenate([errors, errors])
        params, losses, _ = _train_loop(
            mlp, params, norm, x, y, key, jnp.asarray(lr, dtype), batch_size,
            steps, n_val_eff,
        )
    else:
        params, losses, _ = _train_loop(
            mlp, params, norm, log_ks, errors, key, jnp.asarray(lr, dtype),
            batch_size, steps, n_val,
        )
    return TrainedSurrogate(mlp=mlp, params=params, norm=norm), losses
