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
_enabled = True


def set_task_system_enabled(flag: bool) -> None:
    """Honors the UseTaskSystem config key: when off, schedule_task and
    parallel_map run synchronously on the caller (the reference's
    task-system-disabled fallback, ``Application.cpp:1025-1038``)."""
    global _enabled
    _enabled = bool(flag)


def get_scheduler() -> ThreadPoolExecutor:
    """Singleton pool with (hardware threads - 1) workers, like
    ``FTaskScheduler::Initialize`` (TaskSystem.cpp:49-76)."""
    global _scheduler
    if _scheduler is None:
        workers = max(1, (os.cpu_count() or 2) - 1)
        _scheduler = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="task")
    return _scheduler


def schedule_task(fn: Callable, *args, **kwargs):
    """Fire-and-collect single task (``FTaskScheduler::ScheduleTask``).
    Runs inline (returning an already-completed future) when the task
    system is disabled."""
    if not _enabled:
        from concurrent.futures import Future

        f: Future = Future()
        try:
            f.set_result(fn(*args, **kwargs))
        except BaseException as e:  # noqa: BLE001 - mirror executor behavior
            f.set_exception(e)
        return f
    return get_scheduler().submit(fn, *args, **kwargs)


def parallel_map(fn: Callable, items: Sequence, use_tasks: bool = True) -> list:
    """``FParallelFor::Execute`` analog; falls back to serial like the
    reference's task-system-disabled path.

    Nested calls (a pool task -- e.g. an async scene reload -- fanning out
    its own parallel_map) run serially on the calling worker: blocking a
    worker on futures that queue behind it deadlocks small pools (the
    reference's FParallelFor executes on the calling thread when the
    scheduler is busy for the same reason)."""
    import threading

    on_pool_worker = threading.current_thread().name.startswith("task")
    if not _enabled or not use_tasks or len(items) <= 1 or on_pool_worker:
        return [fn(it) for it in items]
    return list(get_scheduler().map(fn, items))
