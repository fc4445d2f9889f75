"""CSE feature distillation: fit CSENet to precomputed surface embeddings.

The reference's ft_cse/mt_cse machinery (moda.py:723-731,
convert_batch_input at 1388-1398) keeps a frozen copy of DensePose
features and penalizes the trainable CSE net's drift while letting it
adapt to the video. Offline equivalent: minimize
||CSENet(img) - feat_precomputed||^2 over masked pixels, then use the net
to (re)generate Densepose artifacts for preprocessing.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moda_tpu.fields.cse import CSENet


class CSEDistiller:
    def __init__(self, lr: float = 1e-4, seed: int = 0, input_size: int = 224):
        self.net = CSENet()
        self.input_size = input_size
        self.params = self.net.init(
            jax.random.key(seed), jnp.zeros((1, input_size, input_size, 3)))["params"]
        self.opt = optax.adamw(lr, weight_decay=1e-4)
        self.opt_state = self.opt.init(self.params)

        @jax.jit
        def step(params, opt_state, imgs, feats, masks):
            def loss_fn(p):
                pred = self.net.apply({"params": p}, imgs)
                err = ((pred - feats) ** 2).sum(-1, keepdims=True) * masks
                return err.sum() / jnp.maximum(masks.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def train(self, batches: Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]],
              steps: int):
        """batches yield (imgs [N,S,S,3], feats [N,S/2,S/2,16], masks
        [N,S/2,S/2,1])."""
        losses = []
        for i, (imgs, feats, masks) in zip(range(steps), batches):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(imgs),
                jnp.asarray(feats), jnp.asarray(masks))
            losses.append(float(loss))
        return losses

    def predict(self, imgs: np.ndarray) -> np.ndarray:
        return np.asarray(self.net.apply({"params": self.params}, jnp.asarray(imgs)))
