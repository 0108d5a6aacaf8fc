"""Pipeline: left-to-right composition of signal transforms.

reference: tools/pipeline.py:16-124 — append(callable, **kwargs) with
exactly one unbound argument; calling the pipeline folds the callables.
The Spark analog is DataFrame.transform chaining; this class preserves
the reference's API shape (append / __call__ / __contains__) while each
step stays a lazy plan extension — nothing executes until an action.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable


class Pipeline:
    """Compose callables where each has exactly one unbound argument.

    >>> pipe = Pipeline()
    >>> pipe.append(downsample, M=10)
    >>> pipe.append(welch_psd, nfft=512)
    >>> psd = pipe(signal_frame)       # lazy DataFrame plan
    """

    def __init__(self) -> None:
        self._steps: list[Callable] = []

    def append(self, caller: Callable, **kwargs: Any) -> "Pipeline":
        """Validate exactly one unbound parameter remains
        (reference: tools/pipeline.py:61-74)."""
        sig = inspect.signature(caller)
        bound_names = set(kwargs)
        required = [
            p.name
            for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (inspect.Parameter.POSITIONAL_OR_KEYWORD, inspect.Parameter.POSITIONAL_ONLY)
        ]
        unbound = [n for n in required if n not in bound_names]
        if len(unbound) != 1:
            raise TypeError(
                f"Pipeline step {caller.__name__!r} must have exactly one unbound "
                f"argument; got {unbound!r}"
            )
        self._steps.append(functools.partial(caller, **kwargs))
        return self

    def __contains__(self, caller: Callable) -> bool:
        """reference: tools/pipeline.py:87-101."""
        return any(
            step.func is caller if isinstance(step, functools.partial) else step is caller
            for step in self._steps
        )

    def __call__(self, data: Any) -> Any:
        for step in self._steps:
            data = step(data)
        return data
