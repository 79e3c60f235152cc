"""Deferred-function builders: the user-facing callables.

Importing this module loads every registry module (side-effect
registration) and exposes a builder per registered name; ``mean(f.x)``
returns an unevaluated Call node that verbs compile to a Spark Column.
"""

from __future__ import annotations

from . import aggregates, conditional, math, special, strings, types, vectors, window  # noqa: F401
from . import complex as _complex_mod  # noqa: F401  (side-effect registration)
from .rbase import (  # noqa: F401
    make_names,
    make_unique,
    identity_,
    seq,
    seq_len,
    length,
    rep,
    rev_list,
    sort_list,
    order_list,
    sample_list,
    set_seed,
    intersect,
    union,
    setdiff,
    setequal,
    append_,
)
from . import across as _across_mod  # noqa: F401
from .across import Across, across, cur_column  # noqa: F401
from .strings import grep  # noqa: F401  (eager index helper, not a builder)
from .registry import REGISTRY, builder

_ALIASES = sorted(REGISTRY.keys())

# canonical exported names (avoid shadowing python builtins at import *)
_EXPORT = {
    # aggregates
    "sum_", "mean", "median", "min_", "max_", "sd", "var", "prod",
    "n", "n_distinct", "quantile", "weighted_mean", "cov", "cor",
    "all_", "any_", "first", "last", "nth",
    # window
    "row_number", "min_rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile", "lead", "lag", "cumsum", "cummax", "cummin", "cummean",
    "cumprod", "cumall", "cumany", "cumcount", "consecutive_id",
    "roll_sum", "roll_mean", "roll_min", "roll_max",
    # conditional
    "if_else", "ifelse", "case_when", "case_match", "coalesce", "na_if",
    "between", "near", "recode", "is_na", "nan_to_null",
    # strings
    "toupper", "tolower", "nchar", "nzchar", "paste", "paste0", "grepl",
    "gsub", "sub", "substr", "substring", "str_sub", "sprintf", "trimws",
    "startswith",
    "endswith", "strsplit", "strtoi", "chartr", "str_pad", "str_count",
    "str_detect", "str_extract", "str_replace", "str_replace_all",
    # math
    "abs_", "sqrt", "exp", "log", "log2", "log10", "log1p", "expm1",
    "floor", "ceiling", "round_", "trunc", "sign", "signif", "pmin",
    "pmax", "mod", "scale", "proportions", "atan2", "factorial",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "asinh", "acosh", "atanh", "sinpi", "cospi", "tanpi",
    # types
    "as_character", "as_double", "as_integer", "as_logical", "as_numeric",
    "as_date", "is_null", "is_finite", "is_infinite", "is_element",
    "match", "isin", "is_double", "is_integer", "is_logical",
    "is_character", "is_numeric", "is_true", "is_false", "is_atomic",
    "as_null",
    # across-family registry entries
    "c_across", "if_any", "if_all",
    # vectors / context
    "sort_", "order_", "rank", "sample_", "unique_", "any_na",
    "cur_group_rows",
    "rev_", "duplicated", "lengths", "seq_along", "diff", "runif", "rnorm",
    "rexp", "rcauchy", "rchisq", "rbinom", "rpois",
    "row_sums", "row_means", "row_mins", "row_maxs", "row_sds",
    "row_medians", "first2", "last2",
    "which", "which_min", "which_max",
    "cur_group", "cur_group_id",
    # complex (struct<re,im> representation)
    "arg", "as_complex", "complex_", "conj", "im", "is_complex", "re_",
    # special math
    "gamma", "lgamma", "lfactorial", "beta", "lbeta", "choose", "lchoose",
    "digamma", "trigamma", "psigamma",
    "bessel_i", "bessel_j", "bessel_k", "bessel_y",
    # ordering sugar
    "with_order", "order_by",
    # context data
    "cur_data", "cur_data_all",
    # sketch aggregates (scale path)
    "approx_n_distinct", "approx_quantile",
    # cube/rollup helpers
    "grouping_id",
}

globals().update({name: builder(name) for name in _EXPORT if name in REGISTRY})
# eager-only (no deferred compiler): outer product on plain vectors
outer = builder("outer")
# eager-only R which family over plain vectors (table-level forms are
# the which_/which_min_/which_max_ verbs in operators.misc)
which = builder("which")
which_min = builder("which_min")
which_max = builder("which_max")
# names registered under a different canonical key
for name in _EXPORT - set(REGISTRY):
    base = name.rstrip("_")
    if base in REGISTRY:
        globals()[name] = builder(base)

__all__ = sorted(
    _EXPORT
    | {"across", "Across", "cur_column", "grep", "outer"}
    | {"seq", "seq_len", "length", "rep", "rev_list", "sort_list", "order_list",
       "sample_list", "set_seed", "intersect", "union", "setdiff",
       "setequal", "append_", "make_names", "make_unique", "identity_"}
)
