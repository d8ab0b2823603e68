"""picasso_tpu.nanotron — classification of picked structures from
rendered images.

Capability parity with picasso/nanotron.py (prepare_img :21,
rotate_img :54, roi_to_img :74, prepare_data :148, predict_structure
:218). The reference classifies with a pickled sklearn MLPClassifier;
here the model is a small flax MLP trained with optax on device —
batched forward passes over all picks at once — with an
sklearn-compatible train/predict API and ``save_model``/``load_model``
round trips.
"""

from __future__ import annotations

import pickle
from typing import Sequence

import numpy as np
import pandas as pd
from scipy import ndimage

from picasso_tpu import lib, render


def prepare_img(
    img: np.ndarray, img_shape: int, alpha: float = 1, bg: float = 0
) -> np.ndarray:
    """Scale, background-subtract, normalize and flatten one image
    (picasso/nanotron.py:21)."""
    img = alpha * np.asarray(img, float) - bg
    mx = img.max()
    if mx > 0:
        img = img / mx
    img = img.clip(min=0)
    return img.reshape(img_shape**2)


def rotate_img(img: np.ndarray, angle: float) -> np.ndarray:
    """Rotate an image by angle degrees (picasso/nanotron.py:54)."""
    return ndimage.rotate(img, angle, reshape=False)


def roi_to_img(
    locs: pd.DataFrame,
    pick: int,
    radius: float,
    oversampling: float,
    picks=None,
) -> np.ndarray:
    """Render one pick into a square oversampled image
    (picasso/nanotron.py:74)."""
    if picks is None:
        pick_locs = locs[locs["group"] == pick]
    else:
        x, y = picks
        pick_locs = lib.locs_at(x, y, locs, radius)
        pick_locs = pick_locs.sort_values(by="frame", kind="quicksort")
    radius -= 0.001
    x_mean = np.mean(pick_locs["x"])
    y_mean = np.mean(pick_locs["y"])
    viewport = (
        (y_mean - radius, x_mean - radius),
        (y_mean + radius, x_mean + radius),
    )
    _, pick_img = render.render(
        pick_locs,
        None,
        viewport=viewport,
        oversampling=oversampling,
        blur_method="smooth",
    )
    return pick_img


def prepare_data(
    locs: pd.DataFrame,
    label: int,
    pick_radius: float,
    oversampling: float,
    alpha: float = 10,
    bg: float = 1,
    export: bool = False,
) -> tuple[list[np.ndarray], list[int]]:
    """Render every pick of a labeled dataset with rotation
    augmentation (picasso/nanotron.py:148)."""
    img_shape = int(2 * pick_radius * oversampling)
    data = []
    labels = []
    for pick in np.unique(locs["group"]):
        pick_img = roi_to_img(
            locs, pick, radius=pick_radius, oversampling=oversampling
        )
        for angle in (0, 90, 180, 270):
            img = (
                pick_img
                if angle == 0
                else rotate_img(pick_img, angle)
            )
            data.append(
                prepare_img(
                    img, img_shape=img_shape, alpha=alpha, bg=bg
                )
            )
            labels.append(label)
    return data, labels


# ---------------------------------------------------------------------------
# flax MLP classifier
# ---------------------------------------------------------------------------


class MLPClassifier:
    """Minimal sklearn-compatible MLP classifier backed by flax/optax,
    trained and evaluated on device."""

    def __init__(
        self,
        hidden_layer_sizes: Sequence[int] = (100,),
        learning_rate: float = 1e-3,
        max_iter: int = 200,
        batch_size: int = 128,
        seed: int = 0,
    ):
        self.hidden_layer_sizes = tuple(hidden_layer_sizes)
        self.learning_rate = learning_rate
        self.max_iter = max_iter
        self.batch_size = batch_size
        self.seed = seed
        self.params = None
        self.classes_ = None
        self._n_features = None

    def _model(self):
        import flax.linen as nn

        hidden = self.hidden_layer_sizes
        n_classes = len(self.classes_)

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                for h in hidden:
                    x = nn.relu(nn.Dense(h)(x))
                return nn.Dense(n_classes)(x)

        return MLP()

    def fit(self, X, y):
        import jax
        import jax.numpy as jnp
        import optax

        X = np.asarray(X, np.float32)
        y = np.asarray(y)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        self._n_features = X.shape[1]
        model = self._model()
        rng = jax.random.PRNGKey(self.seed)
        params = model.init(rng, jnp.zeros((1, X.shape[1])))
        tx = optax.adam(self.learning_rate)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, xb, yb):
            def loss_fn(p):
                logits = model.apply(p, xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb
                ).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n = len(X)
        rng_np = np.random.default_rng(self.seed)
        bs = min(self.batch_size, n)
        # per-epoch mean loss, like sklearn's MLPClassifier
        self.loss_curve_ = []
        for epoch in range(self.max_iter):
            order = rng_np.permutation(n)
            epoch_losses = []
            for start in range(0, n - bs + 1, bs):
                idx = order[start:start + bs]
                params, opt_state, loss = step(
                    params,
                    opt_state,
                    jnp.asarray(X[idx]),
                    jnp.asarray(y_idx[idx]),
                )
                epoch_losses.append(loss)
            if epoch_losses:
                self.loss_curve_.append(
                    float(np.mean([float(v) for v in epoch_losses]))
                )
        self.params = jax.device_get(params)
        return self

    def _logits(self, X):
        import jax.numpy as jnp

        model = self._model()
        return np.asarray(
            model.apply(self.params, jnp.asarray(X, jnp.float32))
        )

    def predict(self, X):
        return self.classes_[np.argmax(self._logits(X), axis=1)]

    def predict_proba(self, X):
        logits = self._logits(X)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    def score(self, X, y):
        return float(np.mean(self.predict(X) == np.asarray(y)))


def train_model(
    data: list[np.ndarray],
    labels: list[int],
    hidden_layer_sizes: Sequence[int] = (100,),
    max_iter: int = 200,
    learning_rate: float = 1e-3,
) -> MLPClassifier:
    """Train a classifier on prepared pick images."""
    model = MLPClassifier(
        hidden_layer_sizes=hidden_layer_sizes,
        max_iter=max_iter,
        learning_rate=learning_rate,
    )
    return model.fit(np.stack(data), np.asarray(labels))


def save_model(path: str, model: MLPClassifier, info: dict | None = None):
    """Pickle the trained model (the reference ships its model as
    ``model/default_model.sav``)."""
    with open(path, "wb") as f:
        pickle.dump({"model": model, "info": info or {}}, f)


def load_model(path: str) -> tuple[MLPClassifier, dict]:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["model"], blob.get("info", {})


def predict_structure(
    mlp,
    locs: pd.DataFrame,
    pick: int,
    pick_radius: float,
    oversampling: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Classify one pick: render, normalize, predict probabilities
    (picasso/nanotron.py:218)."""
    img_shape = int(2 * pick_radius * oversampling)
    pick_img = roi_to_img(
        locs, pick=pick, radius=pick_radius, oversampling=oversampling
    )
    img = prepare_img(pick_img, img_shape=img_shape, alpha=10, bg=1)
    pred = mlp.predict(img.reshape(1, -1))
    pred_proba = mlp.predict_proba(img.reshape(1, -1))
    return pred, pred_proba
