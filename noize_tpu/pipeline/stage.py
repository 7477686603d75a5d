"""Stage protocol — configurable op wrappers (reference L3).

Reference: ``PipelineStage`` (/root/reference/Pipeline/Stage/
PipelineStage.cs:10-63) and ``PipelineWorkItem``/``PipelineDefinition``
(Pipeline/Stage/PipelineDefinition.cs:18-115).

A stage is a frozen dataclass of user-tunable parameters (the
ScriptableObject asset) plus a pure ``apply``.  The reference's stage hooks
map as:

  Schedule(workItem, dep)      → apply(work) — returns the new work item
  CheckRequirements<T>         → check_requirements(work, T)
  TransformData                → apply returning a different payload type
  IsSchedulable(workItem)      → is_schedulable(work) — context-buffer gates
  ResizeNativeContainers       → (gone: no manual buffers)
  OnStageComplete / OnDestroy  → on_complete(work) / (gone)

Stages whose body is pure array math also expose ``array_fn(data) -> data``
so ``compose.fuse`` can chain them into one jitted XLA program — the
reference's eager JobHandle DAG becomes a single fused computation.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional, Sequence

from ..core.stageio import StageIO


class RequirementError(TypeError):
    """CheckRequirements failure (PipelineStage.cs:29-39)."""


@dataclass
class PipelineWorkItem:
    """PipelineDefinition.cs:18-25: payload + callbacks + state manager."""

    data: StageIO
    state_manager: Any = None
    on_scheduled: Optional[Callable] = None
    on_complete: Optional[Callable] = None


@dataclass(frozen=True)
class Stage:
    def check_requirements(self, work: PipelineWorkItem, payload_type):
        if not isinstance(work.data, payload_type):
            raise RequirementError(
                f"{type(self).__name__} requires {payload_type.__name__}, "
                f"got {type(work.data).__name__}"
            )

    # --- hooks --------------------------------------------------------------

    def is_schedulable(self, work: PipelineWorkItem) -> bool:
        return True

    def apply(self, work: PipelineWorkItem) -> PipelineWorkItem:
        raise NotImplementedError

    def on_complete(self, work: PipelineWorkItem):
        return None

    # --- fusion -------------------------------------------------------------

    @property
    def fusable(self) -> bool:
        """True when the stage is pure array→array on the payload's ``data``
        and can join a fused jit chain."""
        return hasattr(self, "array_fn")
