"""Linear probing head
(`/root/reference/reproducibility/evaluation/linear_probing/linear_classifier.py:8-40`).

Two backends:
- ``sklearn`` (default): the reference's exact ``SGDClassifier(loss='log_loss',
  penalty='l2', alpha, max_iter=10000, class_weight='balanced', random_state)``
  contract, for drop-in reproduction of paper numbers.
- ``jax``: TPU-native full-batch logistic regression (optax Adam on the same
  balanced-weighted L2-regularized log loss) — for probing at scales where a
  host-bound sklearn fit is the bottleneck.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .metrics import eval_metrics


class _JaxLogisticRegression:
    """Balanced-class-weight multinomial logistic regression with L2 (alpha)."""

    def __init__(self, alpha: float, seed: int, steps: int = 2000, lr: float = 0.05):
        self.alpha = alpha
        self.seed = seed
        self.steps = steps
        self.lr = lr

    def fit(self, X: np.ndarray, y: np.ndarray):
        import jax
        import jax.numpy as jnp
        import optax

        X = jnp.asarray(X, jnp.float32)
        y = jnp.asarray(y, jnp.int32)
        n, d = X.shape
        k = int(np.max(np.asarray(y))) + 1
        counts = np.bincount(np.asarray(y), minlength=k)
        # sklearn 'balanced': w_c = n / (k * count_c)
        cls_w = jnp.asarray(n / (k * np.maximum(counts, 1)), jnp.float32)

        key = jax.random.PRNGKey(self.seed)
        params = {
            "w": jax.random.normal(key, (d, k), jnp.float32) * 0.01,
            "b": jnp.zeros((k,), jnp.float32),
        }

        def loss_fn(p):
            logits = X @ p["w"] + p["b"]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -logp[jnp.arange(n), y] * cls_w[y]
            reg = 0.5 * self.alpha * jnp.sum(p["w"] ** 2)
            return nll.mean() + reg

        opt = optax.adam(self.lr)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(loss_fn)(params)
            updates, state = opt.update(g, state)
            return optax.apply_updates(params, updates), state

        for _ in range(self.steps):
            params, state = step(params, state)
        self.params = jax.tree.map(np.asarray, params)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        logits = np.asarray(X, np.float32) @ self.params["w"] + self.params["b"]
        return np.argmax(logits, axis=-1)


class LinearProber:
    def __init__(self, alpha: float, seed: int = 7, backend: str = "sklearn"):
        self.alpha = alpha
        self.seed = seed
        self.backend = backend

    def train_and_test(
        self, train_x: List, train_y: List, test_x: List, test_y: List
    ) -> Tuple[object, Tuple[dict, dict]]:
        from sklearn.preprocessing import LabelEncoder

        le = LabelEncoder()
        train_y = np.asarray(le.fit_transform(train_y))
        test_y = np.asarray(le.transform(test_y))

        if self.backend == "sklearn":
            from sklearn.linear_model import SGDClassifier

            classifier = SGDClassifier(
                random_state=self.seed,
                loss="log_loss",
                alpha=self.alpha,
                verbose=0,
                penalty="l2",
                max_iter=10000,
                class_weight="balanced",
            )
        else:
            classifier = _JaxLogisticRegression(self.alpha, self.seed)

        classifier.fit(train_x, train_y)
        test_pred = classifier.predict(test_x)
        train_pred = classifier.predict(train_x)

        test_metrics = eval_metrics(test_y, test_pred, average_method="macro")
        train_metrics = eval_metrics(train_y, train_pred, average_method="macro")
        test_metrics["split"] = "test"
        train_metrics["split"] = "train"
        return classifier, (test_metrics, train_metrics)
