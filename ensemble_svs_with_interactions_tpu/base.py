"""Base model contract for the TPU model zoo.

Re-design of the reference's model protocol
(/root/reference/nnsvs/base.py:6,74) on top of flax.linen:

* ``__call__(x, lengths=None, y=None, train=False)``  — training forward.
* ``inference(x, lengths=None)``                      — inference entry;
  MDN models return ``(mu, sigma)``; multistream/diffusion models return
  concatenated static+dynamic features.
* ``prediction_type()`` / ``is_autoregressive()`` /
  ``has_residual_lf0_prediction()`` — static metadata used by the
  training loop and the generation pipeline.

Call-side convention (functional JAX): ``model.apply(variables, ...,
method="inference")`` for inference; dropout keys threaded via
``rngs={"dropout": key}`` when ``train=True``.
"""

from __future__ import annotations

import enum

import flax.linen as nn


class PredictionType(enum.Enum):
    DETERMINISTIC = 1
    PROBABILISTIC = 2
    MULTISTREAM_HYBRID = 3
    DIFFUSION = 4


class BaseModel(nn.Module):
    """Common superclass for all models in the zoo."""

    def inference(self, x, lengths=None):
        return self(x, lengths)

    def preprocess_target(self, y):
        """Hook for shallow-AR models that filter target features."""
        return y

    def prediction_type(self) -> PredictionType:
        return PredictionType.DETERMINISTIC

    def is_autoregressive(self) -> bool:
        return False

    def has_residual_lf0_prediction(self) -> bool:
        return False
