"""String functions (reference ``api/base/string.py``, 637 LoC).

All compile to JVM-side ``pyspark.sql.functions`` — no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from .registry import register


@register("toupper")
def _toupper(ctx, x):
    return F.upper(ctx.col(x))


@register("tolower")
def _tolower(ctx, x):
    return F.lower(ctx.col(x))


@register("nchar")
def _nchar(ctx, x):
    return F.length(ctx.col(x))


@register("nzchar")
def _nzchar(ctx, x):
    return F.length(ctx.col(x)) > 0


@register("paste")
def _paste(ctx, *xs, sep: str = " ", collapse=None):
    cols = [ctx.col(x).cast("string") for x in xs]
    joined = F.concat_ws(sep, *cols) if len(cols) > 1 else cols[0]
    if collapse is not None:
        return ctx.agg(F.array_join(F.collect_list(joined), collapse))
    return joined


@register("paste0")
def _paste0(ctx, *xs, collapse=None):
    return _paste(ctx, *xs, sep="", collapse=collapse)


@register("grepl", "str_detect")
def _grepl(ctx, pattern, x=None, ignore_case: bool = False, fixed: bool = False):
    # R arg order: grepl(pattern, x)
    pat = ctx.eval(pattern)
    col = ctx.col(x)
    if fixed:
        return col.contains(pat)
    if ignore_case:
        pat = "(?i)" + pat
    return col.rlike(pat)


def _repl_to_java(repl: str, fixed: bool = False, shift: int = 0) -> str:
    """R-style replacement (``\\N`` group refs, literal ``$``) to Java
    Matcher syntax (``$N`` refs, ``\\$`` literal dollar). ``shift``
    renumbers group refs when the pattern gained a leading group."""
    if fixed:
        # fixed pattern has no groups: replacement is fully literal
        return repl.replace("\\", "\\\\").replace("$", "\\$")
    out: list[str] = []
    i = 0
    while i < len(repl):
        ch = repl[i]
        if ch == "\\" and i + 1 < len(repl):
            nxt = repl[i + 1]
            if nxt.isdigit():
                out.append("$" + str(int(nxt) + shift))
            elif nxt == "$":
                out.append("\\\\\\$")
            else:
                out.append("\\\\" + nxt)
            i += 2
            continue
        out.append("\\$" if ch == "$" else ch)
        i += 1
    return "".join(out)


@register("gsub", "str_replace_all")
def _gsub(ctx, pattern, replacement, x=None, ignore_case: bool = False, fixed: bool = False):
    pat = ctx.eval(pattern)
    repl = _repl_to_java(ctx.eval(replacement), fixed=fixed)
    col = ctx.col(x)
    if fixed:
        pat = re.escape(pat)
    if ignore_case:
        pat = "(?i)" + pat
    return F.regexp_replace(col, pat, repl)


@register("sub", "str_replace")
def _sub(ctx, pattern, replacement, x=None, ignore_case: bool = False, fixed: bool = False):
    """Replace FIRST occurrence only: anchor via capturing the prefix
    (group refs in the replacement renumber by one)."""
    pat = ctx.eval(pattern)
    repl = _repl_to_java(ctx.eval(replacement), fixed=fixed, shift=1)
    col = ctx.col(x)
    if fixed:
        pat = re.escape(pat)
    flags = "(?i)" if ignore_case else ""
    # ^(.*?) lazily matches the shortest prefix before the first match
    return F.regexp_replace(col, f"{flags}^((?s:.*?)){pat}", "$1" + repl)


@register("substr", "substring")
def _substr(ctx, x, start, stop):
    """Reference semantics (api/base/string.py:497-505): 0-indexed
    start, EXCLUSIVE stop, like Python slices — not R's 1-based."""
    col = ctx.col(x)
    s = int(ctx.eval(start))
    e = int(ctx.eval(stop))
    return F.substring(col, s + 1, max(e - s, 0))


@register("str_sub")
def _str_sub(ctx, x, start=1, end=-1):
    col = ctx.col(x)
    s = int(ctx.eval(start))
    e = int(ctx.eval(end))
    if e == -1:
        return F.substring(col, s, 1 << 30)
    return F.substring(col, s, e - s + 1)


@register("sprintf")
def _sprintf(ctx, fmt, *xs):
    return F.format_string(ctx.eval(fmt), *[ctx.col(x) for x in xs])


@register("trimws")
def _trimws(ctx, x, which: str = "both"):
    """R trimws strips ALL whitespace (tabs/newlines too); Spark's
    trim() strips spaces only, so compile to a regexp."""
    col = ctx.col(x)
    if which == "left":
        return F.regexp_replace(col, r"^\s+", "")
    if which == "right":
        return F.regexp_replace(col, r"\s+$", "")
    return F.regexp_replace(col, r"^\s+|\s+$", "")


@register("startswith", "starts_with_str", "str_starts")
def _startswith(ctx, x, prefix):
    return ctx.col(x).startswith(ctx.eval(prefix))


@register("endswith", "str_ends")
def _endswith(ctx, x, suffix):
    return ctx.col(x).endswith(ctx.eval(suffix))


@register("strsplit", "str_split")
def _strsplit(ctx, x, split, fixed: bool = False):
    pat = ctx.eval(split)
    if fixed:
        pat = re.escape(pat)
    return F.split(ctx.col(x), pat)


@register("strtoi")
def _strtoi(ctx, x, base: int = 10):
    b = int(ctx.eval(base))
    if b == 10:
        return ctx.col(x).cast("long")
    return F.conv(ctx.col(x), b, 10).cast("long")


@register("chartr")
def _chartr(ctx, old, new, x):
    return F.translate(ctx.col(x), ctx.eval(old), ctx.eval(new))


@register("str_pad")
def _str_pad(ctx, x, width, side: str = "left", pad: str = " "):
    col = ctx.col(x)
    w = int(ctx.eval(width))
    if side == "left":
        return F.lpad(col, w, pad)
    if side == "right":
        return F.rpad(col, w, pad)
    half = F.lpad(col, (w + F.length(col).cast("int")) / 2, pad)
    return F.rpad(half, w, pad)


@register("str_count")
def _str_count(ctx, x, pattern):
    return F.regexp_count(ctx.col(x), F.lit(ctx.eval(pattern)))


@register("regexp_extract", "str_extract")
def _str_extract(ctx, x, pattern, group: int = 0):
    return F.regexp_extract(ctx.col(x), ctx.eval(pattern), int(ctx.eval(group)))


def grep(
    pattern,
    x,
    ignore_case: bool = False,
    value: bool = False,
    fixed: bool = False,
    invert: bool = False,
) -> list:
    """Indices (0-based) of elements matching ``pattern`` — an eager
    driver-side list helper like the reference's scalar dispatch
    (api/base/string.py:244-274). ``value=True`` returns the matching
    elements instead. Scalars are treated as 1-element vectors. For a
    distributed membership test on a column, use ``grepl`` (compiles to
    a JVM regexp filter).
    """
    xs = [x] if isinstance(x, str) else list(x)
    pat = str(pattern)
    if fixed:
        hit = (
            (lambda s: pat.lower() in s.lower())
            if ignore_case
            else (lambda s: pat in s)
        )
    else:
        rx = re.compile(pat, re.IGNORECASE if ignore_case else 0)
        hit = lambda s: bool(rx.search(s))
    out = [
        (s if value else i)
        for i, s in enumerate(xs)
        if s is not None and bool(hit(str(s))) != invert
    ]
    return out
