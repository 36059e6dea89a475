"""Trainer lifecycle protocol (reference model_abstraction.py:4-37).

The reference defines an abstract ``ModuleAbstract`` with the lifecycle
methods every trainer must implement. In this framework the numerical
step is a pure jitted function, so the lifecycle lives on the
experiment runtime (``runtime.TrainLoop``) instead of an nn.Module;
this Protocol pins down that surface structurally (isinstance checks
via ``runtime_checkable``) so alternative trainers can be swapped into
``train.py`` through the MODEL registry with the same contract.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class TrainerModule(Protocol):
    """Lifecycle surface of a trainer (model_abstraction.py names)."""

    def training_step(self) -> dict:
        """Advance one (bundled) optimization step; returns the metric
        aux dict (loss/psnr/...). Reference: training_step(batch, idx)."""
        ...

    def validation_step(self, step: int) -> None:
        """Render + score a held-out view (validate_image)."""
        ...

    def compute_loss(self, aux: dict) -> float:
        """Scalar loss from a step's aux (loss assembly itself is inside
        the jitted step — models/trainer.py; NeuS_Trainer.py:129-171)."""
        ...

    def on_train_finished(self, step: int) -> None:
        """Flush/dump accumulated train losses (text dump + reset)."""
        ...

    def on_val_finished(self, step: int) -> None:
        """Flush/dump accumulated val metrics."""
        ...

    def testing_step(self, step: int, recon_res: int) -> Any:
        """Mesh extraction (validate_mesh; NeuS_Trainer.py:321-322)."""
        ...
