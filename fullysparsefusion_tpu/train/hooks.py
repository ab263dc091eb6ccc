"""Training-schedule hooks.

The reference mutates a ``runtime_info`` dict from mmcv hooks
(core/hook/fsd_hooks.py): ``EnableFSDDetectionHookIter`` flips detection on
after a warmup and decays a segmentation-threshold buffer;
``DisableAugmentationHook`` turns off GT-paste augmentation for the last
epochs. In a jit world these become *pure step-indexed schedules* the train
loop evaluates host-side and passes into the step (as scalars) or into the
data pipeline (aug switch).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RuntimeSchedule:
    """Step-indexed runtime toggles (fsd_hooks.py:53-89 semantics)."""

    enable_detection_step: int = 0       # detection losses off before this
    threshold_buffer_start: float = 0.0  # extra fg-score threshold at step 0
    threshold_buffer_end_step: int = 0   # linear decay to 0 by this step
    disable_aug_step: int = -1           # GT-paste aug off from this step (-1 = never)

    def enable_detection(self, step: int) -> bool:
        return step >= self.enable_detection_step

    def threshold_buffer(self, step: int) -> float:
        """Buffer applies only once detection is enabled, then decays
        linearly to 0 over [enable_detection_step, threshold_buffer_end_step]
        (fsd_hooks.py:86-89: the hook sets the buffer when it enables
        detection and decays it over ``buffer_iter`` from there)."""
        if self.threshold_buffer_end_step <= self.enable_detection_step:
            return 0.0
        if step < self.enable_detection_step:
            return 0.0
        span = self.threshold_buffer_end_step - self.enable_detection_step
        frac = min((step - self.enable_detection_step) / span, 1.0)
        return self.threshold_buffer_start * (1.0 - frac)

    def augmentation_enabled(self, step: int) -> bool:
        return self.disable_aug_step < 0 or step < self.disable_aug_step
