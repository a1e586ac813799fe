"""Optimizer and learning-rate schedule matching the reference's training.

The reference trains with ``torch.optim.RMSprop(lr=1e-2)`` (all other torch
defaults: alpha=0.99, eps=1e-8 added OUTSIDE the sqrt, no momentum, square
average initialized at zero; reference ``train_on_flyingthings3d.py:68``) and
``MultiStepLR(milestones=[6..10], gamma=0.5)`` stepped per epoch (reference
``train_on_flyingthings3d.py:70-72``, stepped at ``trainer.py:136``).

Here the optimizer is an optax gradient transformation configured to the
exact torch RMSprop update, and the schedule is a pure function of the epoch
index. The learning rate enters the jitted train step as a scalar argument,
so epoch-boundary changes do not retrigger compilation.
"""

from __future__ import annotations

from typing import Sequence

import optax


def rmsprop(alpha: float = 0.99, eps: float = 1e-8):
    """Torch-parity RMSprop: ``p -= lr * g / (sqrt(avg) + eps)``.

    Returns an optax transformation WITHOUT the learning-rate scaling; apply
    the rate via :func:`apply_updates_with_lr` (keeps lr a runtime scalar).
    """
    return optax.scale_by_rms(decay=alpha, eps=eps, initial_scale=0.0,
                              eps_in_sqrt=False)


def multistep_lr(initial_learning_rate: float,
                 milestones: Sequence[int] = (6, 7, 8, 9, 10),
                 gamma: float = 0.5):
    """Returns epoch -> learning rate, torch ``MultiStepLR`` semantics:
    the rate is multiplied by ``gamma`` once the epoch counter reaches each
    milestone (milestones are 1-based epoch indices AFTER which the decay
    applies, matching the reference's per-epoch ``scheduler.step()``)."""
    milestones = sorted(milestones)

    def schedule(epoch: int) -> float:
        decays = sum(1 for m in milestones if epoch >= m)
        return initial_learning_rate * (gamma ** decays)

    return schedule
