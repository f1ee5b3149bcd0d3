"""Host-side per-epoch LR schedules.

Matches the reference's torch schedulers (reference trainer_fixed.py:78-92),
stepped once per epoch. The learning rate is fed to the jitted train step as
a traced scalar, so host-side scheduling (including the stateful plateau
logic) costs no recompilation.
"""

from __future__ import annotations

import math


class CosineAnnealingLR:
    """torch CosineAnnealingLR(T_max=epochs): lr_e = min + (lr0-min)/2 *
    (1 + cos(pi * e / T_max))."""

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 0.0):
        self.base_lr = base_lr
        self.t_max = max(t_max, 1)
        self.eta_min = eta_min
        self._epoch = 0

    @property
    def lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * 0.5 * (
            1 + math.cos(math.pi * self._epoch / self.t_max)
        )

    def step(self, metric: float | None = None) -> None:
        self._epoch += 1

    def state_dict(self) -> dict:
        return {"epoch": self._epoch}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = int(state["epoch"])


class StepLR:
    """torch StepLR(step_size=30, gamma=0.1) (reference trainer_fixed.py:87-90)."""

    def __init__(self, base_lr: float, step_size: int = 30, gamma: float = 0.1):
        self.base_lr = base_lr
        self.step_size = step_size
        self.gamma = gamma
        self._epoch = 0

    @property
    def lr(self) -> float:
        return self.base_lr * self.gamma ** (self._epoch // self.step_size)

    def step(self, metric: float | None = None) -> None:
        self._epoch += 1

    def state_dict(self) -> dict:
        return {"epoch": self._epoch}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = int(state["epoch"])


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau(mode, factor=0.5, patience=10)
    (reference trainer_fixed.py:83-86; mode='max' in trainer_icbhi.py:86-87)."""

    def __init__(
        self,
        base_lr: float,
        mode: str = "min",
        factor: float = 0.5,
        patience: int = 10,
        min_lr: float = 0.0,
    ):
        self._lr = base_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best: float | None = None
        self.bad_epochs = 0

    @property
    def lr(self) -> float:
        return self._lr

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        return metric < self.best if self.mode == "min" else metric > self.best

    def step(self, metric: float | None = None) -> None:
        if metric is None:
            return
        if self._is_better(metric):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self._lr = max(self._lr * self.factor, self.min_lr)
                self.bad_epochs = 0

    def state_dict(self) -> dict:
        # msgpack has no None: encode "no best yet" as NaN
        return {
            "lr": float(self._lr),
            "best": float("nan") if self.best is None else float(self.best),
            "bad_epochs": int(self.bad_epochs),
        }

    def load_state_dict(self, state: dict) -> None:
        self._lr = float(state["lr"])
        best = float(state["best"])
        self.best = None if math.isnan(best) else best
        self.bad_epochs = int(state["bad_epochs"])


class ConstantLR:
    def __init__(self, base_lr: float):
        self._lr = base_lr

    @property
    def lr(self) -> float:
        return self._lr

    def step(self, metric: float | None = None) -> None:
        pass

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


def build_scheduler(name: str | None, base_lr: float, epochs: int, *, plateau_mode: str = "min"):
    """Scheduler factory keyed by config['training']['scheduler']
    (reference trainer_fixed.py:78-92)."""
    name = (name or "").lower()
    if name == "cosine":
        return CosineAnnealingLR(base_lr, t_max=epochs)
    if name == "plateau":
        return ReduceLROnPlateau(base_lr, mode=plateau_mode)
    if name == "step":
        return StepLR(base_lr)
    return ConstantLR(base_lr)
