"""Host task system: thread pool for asset IO.

Equivalent of ``Source/Core/TaskSystem.*`` (``FTaskScheduler``: HW-threads-1
worker pool, ``FParallelFor`` batched helper) -- used the same way the
reference uses it: parallel texture decode at scene load
(``TextureLoader.cpp:746-841``).  The native decoders (ctypes calls) release
the GIL, so threads give real parallelism on the decode hot loops.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Sequence

_scheduler: ThreadPoolExecutor | None = None


def get_scheduler() -> ThreadPoolExecutor:
    """Singleton pool with (hardware threads - 1) workers, like
    ``FTaskScheduler::Initialize`` (TaskSystem.cpp:49-76)."""
    global _scheduler
    if _scheduler is None:
        workers = max(1, (os.cpu_count() or 2) - 1)
        _scheduler = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="task")
    return _scheduler


def schedule_task(fn: Callable, *args, **kwargs):
    """Fire-and-collect single task (``FTaskScheduler::ScheduleTask``)."""
    return get_scheduler().submit(fn, *args, **kwargs)


def parallel_map(fn: Callable, items: Sequence, use_tasks: bool = True) -> list:
    """``FParallelFor::Execute`` analog; falls back to serial like the
    reference's task-system-disabled path."""
    if not use_tasks or len(items) <= 1:
        return [fn(it) for it in items]
    return list(get_scheduler().map(fn, items))
