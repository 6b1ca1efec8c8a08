"""Parametric encoders for out-of-sample extension.

The reference accepts any ``torch.nn.Module`` as an encoder
(reference: torchdr/affinity_matcher.py:110-114, 239-253, 374-394): the
estimator then optimizes the network's weights instead of a free embedding
matrix, enabling ``transform`` on unseen data. Here the same contract is
provided for flax ``linen.Module``s, plus a convenience MLP.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class MLP(nn.Module):
    """Simple ReLU MLP encoder: features = hidden sizes + output dim."""

    features: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


def make_mlp_encoder(out_dim: int, hidden: Sequence[int] = (32,)) -> MLP:
    return MLP(features=tuple(hidden) + (out_dim,))
