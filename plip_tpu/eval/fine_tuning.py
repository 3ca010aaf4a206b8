"""Fine-tuning evaluation head.

The reference ships an EMPTY placeholder here
(`/root/reference/reproducibility/evaluation/fine_tuning/fine_tuning_classifier.py:5-13`
— ``train_and_test`` that does nothing, class name colliding with the real
FineTuner). This is the working equivalent: same ``train_and_test`` shape as
LinearProber, driving the real supervised FineTuner over image paths.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import List, Tuple

import numpy as np

from .metrics import eval_metrics


class FineTuningClassifier:
    def __init__(
        self,
        model_name: str = "plip",
        backbone: str = None,
        lr: float = 1e-4,
        epochs: int = 3,
        batch_size: int = 32,
        optimizer: str = "AdamW",
        seed: int = 0,
    ):
        self.kw = dict(
            model_name=model_name, backbone=backbone, lr=lr, epochs=epochs,
            batch_size=batch_size, optimizer=optimizer, seed=seed,
        )

    def train_and_test(
        self, train_x: List[str], train_y: List, test_x: List[str], test_y: List
    ) -> Tuple[object, Tuple[dict, dict]]:
        """train_x/test_x: image paths; labels get label-encoded."""
        import pandas as pd
        from sklearn.preprocessing import LabelEncoder

        from ..train.finetune import FineTuner

        le = LabelEncoder()
        ytr = le.fit_transform(train_y)
        yte = le.transform(test_y)
        train_df = pd.DataFrame({"image": train_x, "label": ytr})
        test_df = pd.DataFrame({"image": test_x, "label": yte})

        args = SimpleNamespace(
            model_name=self.kw["model_name"],
            optimizer=self.kw["optimizer"],
            PC_CLIP_ARCH="ViT-B/32",
        )
        ft = FineTuner(
            args=args,
            backbone=self.kw["backbone"],
            num_classes=len(le.classes_),
            lr=self.kw["lr"],
            seed=self.kw["seed"],
        )
        ft.tuner(
            train_df, test_df, batch_size=self.kw["batch_size"],
            epochs=self.kw["epochs"], evaluation_steps=0,
        )

        # final predictions on both splits
        def predict(df):
            import jax.numpy as jnp
            from ..data.datasets import ImageLabelDataset
            from ..data.loader import PrefetchLoader

            outs = []
            loader = PrefetchLoader(ImageLabelDataset(df), self.kw["batch_size"],
                                    device_put=False)
            for (images, _), n in loader:
                logits = ft._eval_fn(ft.state.params, ft._preprocess(images))
                outs.append(np.asarray(logits)[:n])
            return np.argmax(np.concatenate(outs), axis=1)

        test_metrics = eval_metrics(yte, predict(test_df), average_method="macro")
        train_metrics = eval_metrics(ytr, predict(train_df), average_method="macro")
        test_metrics["split"] = "test"
        train_metrics["split"] = "train"
        return ft, (test_metrics, train_metrics)
