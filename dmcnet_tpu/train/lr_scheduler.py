"""Per-iteration learning-rate schedulers (I3D trainer).

MultiFactorScheduler mirrors reference train/lr_scheduler.py:22-61 exactly,
including the quirky first-100-steps lr/2 warmup (":59-60") — a behaviour
the released I3D models were trained with, so it is preserved.
"""

from __future__ import annotations


class LRScheduler:
    def __init__(self, step_counter=0, base_lr=0.01):
        self.step_counter = step_counter
        self.base_lr = base_lr
        self.lr = base_lr

    def update(self):
        raise NotImplementedError

    def get_lr(self):
        return self.lr


class MultiFactorScheduler(LRScheduler):
    """Stepwise decay at iteration numbers `steps`, factor `factor`;
    returns lr/2 for the first 100 iterations."""

    def __init__(self, steps, base_lr=0.01, factor=0.1, step_counter=0):
        super().__init__(step_counter, base_lr)
        assert isinstance(steps, list) and steps, "steps must be non-empty"
        for i in range(1, len(steps)):
            if steps[i] <= steps[i - 1]:
                raise ValueError("steps must be increasing")
        if steps[0] < 1:
            raise ValueError("steps must be >= 1")
        if factor > 1.0:
            raise ValueError("factor must be <= 1")
        self.steps = steps
        self.factor = factor
        self.cursor = 0

    def update(self):
        self.step_counter += 1
        if self.cursor >= len(self.steps):
            return self.lr
        while self.steps[self.cursor] < self.step_counter:
            self.lr *= self.factor
            self.cursor += 1
            if self.cursor >= len(self.steps):
                return self.lr
        if self.step_counter < 100:
            return self.lr / 2.0
        return self.lr
