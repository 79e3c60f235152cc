"""Verb piping machinery.

Replaces pipda's VerbCall dispatch (reference query lifecycle, SURVEY
§3.1): ``df >> group_by(f.g) >> summarise(total=sum_(f.x))``. A verb
called without data returns a ``VerbCall``; ``>>`` (via ``__rrshift__``)
applies it. Calling with a Tibble/DataFrame first argument executes
immediately (function-call style).
"""

from __future__ import annotations

from functools import wraps
from typing import Any, Callable

from pyspark.sql import DataFrame


class VerbCall:
    def __init__(self, fn: Callable, args: tuple, kwargs: dict):
        self._fn = fn
        self._args = args
        self._kwargs = kwargs

    def __rrshift__(self, data: Any):
        from ..tibble import ensure_tibble

        return self._fn(ensure_tibble(data), *self._args, **self._kwargs)

    def __call__(self, data: Any):
        return self.__rrshift__(data)

    def __repr__(self) -> str:
        return f"<VerbCall {self._fn.__name__}>"


def verb(fn: Callable) -> Callable:
    @wraps(fn)
    def wrapper(*args: Any, **kwargs: Any):
        from ..tibble import Tibble, ensure_tibble

        if args and isinstance(args[0], (Tibble, DataFrame)):
            return fn(ensure_tibble(args[0]), *args[1:], **kwargs)
        return VerbCall(fn, args, kwargs)

    wrapper.__verb__ = True
    return wrapper


def verb2(fn: Callable) -> Callable:
    """Two-table verbs (joins, set ops, rows_*): ``x >> left_join(y)``
    passes a table as the first argument, so immediate execution
    requires TWO leading tables."""

    @wraps(fn)
    def wrapper(*args: Any, **kwargs: Any):
        from ..tibble import Tibble, ensure_tibble

        if (
            len(args) >= 2
            and isinstance(args[0], (Tibble, DataFrame))
            # a dict second table is a one-off frame (bind_cols(df, {...}))
            and isinstance(args[1], (Tibble, DataFrame, dict))
        ):
            return fn(ensure_tibble(args[0]), *args[1:], **kwargs)
        if any(isinstance(v, (Tibble, DataFrame)) for v in kwargs.values()):
            # named-frame call (bind_rows(a=df1, b=df2, _id=...)) — no
            # leading table will ever arrive by pipe
            return fn(*args, **kwargs)
        return VerbCall(fn, args, kwargs)

    wrapper.__verb__ = True
    return wrapper
