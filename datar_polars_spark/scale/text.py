"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All registry functions (usable inside mutate/summarise) compiled to
JVM expressions — regex + higher-order functions, no Python UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.registry import register

__all__ = [
    "STOPWORDS", "normalize_text", "html_to_text", "html_extract_links",
]

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "en", "un", "para"],
}


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


@register("token_count")
def _token_count(ctx, x):
    """Whitespace token count."""
    return F.size(_tokens(ctx.col(x)))


@register("bpe_token_estimate")
def _bpe_token_estimate(ctx, x):
    """BPE-ish token estimate: word-piece regex (letters runs, digit
    runs, punctuation singles), the standard ~4-chars-per-token proxy."""
    col = ctx.col(x)
    pieces = F.regexp_count(col, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]"))
    return pieces


@register("char_count")
def _char_count(ctx, x):
    return F.length(ctx.col(x))


@register("punct_ratio")
def _punct_ratio(ctx, x):
    col = ctx.col(x)
    return F.regexp_count(col, F.lit(r"[^\w\s]")) / F.greatest(
        F.length(col), F.lit(1)
    )


@register("digit_ratio")
def _digit_ratio(ctx, x):
    col = ctx.col(x)
    return F.regexp_count(col, F.lit(r"[0-9]")) / F.greatest(F.length(col), F.lit(1))


@register("mean_word_length")
def _mean_word_length(ctx, x):
    toks = _tokens(ctx.col(x))
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


@register("stopword_ratio")
def _stopword_ratio(ctx, x, lang: str = "en"):
    toks = _tokens(ctx.col(x))
    sw = STOPWORDS.get(lang, STOPWORDS["en"])
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


@register("lang_id")
def _lang_id(ctx, x):
    """Heuristic language ID: CJK-character detection for zh, then
    argmax of per-language stopword hit counts."""
    col = ctx.col(x)
    toks = _tokens(col)
    cjk = F.regexp_count(col, F.lit(r"[一-鿿]"))
    def _hits(sw: list):
        return lambda t: t.isin(sw)

    scores = {
        lang: F.size(F.filter(toks, _hits(sw))) for lang, sw in STOPWORDS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(cjk > 0, F.lit("zh")).otherwise(best)


@register("sentence_count")
def _sentence_count(ctx, x):
    """Terminal-punctuation-run count, clamped to >= 1 (a fragment
    with no .!? is one sentence, and readability denominators stay
    total)."""
    return F.greatest(
        F.regexp_count(ctx.col(x), F.lit(r"[.!?]+")), F.lit(1)
    )


@register("syllable_estimate")
def _syllable_estimate(ctx, x):
    """Vowel-group syllable heuristic (runs of [aeiouy] in lowered
    text) — the standard cheap estimator readability formulas were
    fitted against; exact syllabification needs a dictionary."""
    return F.regexp_count(F.lower(ctx.col(x)), F.lit(r"[aeiouy]+"))


@register("flesch_reading_ease")
def _flesch_reading_ease(ctx, x):
    """Flesch reading ease (Flesch 1948): 206.835 - 1.015*(words/
    sentences) - 84.6*(syllables/words), with the vowel-group syllable
    estimate. Higher = easier; English prose lands ~30-80. A crawl
    quality signal (gibberish and boilerplate score far outside the
    prose band), not a certified readability measurement."""
    w = F.greatest(F.size(_tokens(ctx.col(x))), F.lit(1)).cast("double")
    s = _sentence_count(ctx, x).cast("double")
    y = _syllable_estimate(ctx, x).cast("double")
    return F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)


@register("flesch_kincaid_grade")
def _flesch_kincaid_grade(ctx, x):
    """Flesch-Kincaid grade level (Kincaid et al. 1975):
    0.39*(words/sentences) + 11.8*(syllables/words) - 15.59."""
    w = F.greatest(F.size(_tokens(ctx.col(x))), F.lit(1)).cast("double")
    s = _sentence_count(ctx, x).cast("double")
    y = _syllable_estimate(ctx, x).cast("double")
    return F.lit(0.39) * (w / s) + F.lit(11.8) * (y / w) - F.lit(15.59)


@register("type_token_ratio")
def _type_token_ratio(ctx, x):
    """Distinct-token fraction (lexical diversity): near 1 for varied
    prose, collapsing toward 0 for repetitive boilerplate — the cheap
    complement of the Gopher dup-n-gram fractions."""
    toks = _tokens(ctx.col(x))
    return F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )


@register("quality_score")
def _quality_score(ctx, x, min_chars: int = 50, max_chars: int = 100_000):
    """Composite [0,1] quality score: length window, low punct/digit
    noise, sane mean word length — the standard cheap pre-filter."""
    col = ctx.col(x)
    length_ok = (F.length(col) >= min_chars) & (F.length(col) <= max_chars)
    punct = _punct_ratio(ctx, x)
    digit = _digit_ratio(ctx, x)
    mwl = _mean_word_length(ctx, x)
    score = (
        length_ok.cast("double") * 0.4
        + (punct < 0.2).cast("double") * 0.2
        + (digit < 0.3).cast("double") * 0.2
        + ((mwl >= 2) & (mwl <= 12)).cast("double") * 0.2
    )
    return score


@register("doc_fingerprint")
def _doc_fingerprint(ctx, x):
    """Deterministic content fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). Exact-dup key that survives
    formatting noise; SQL-portable (md5 exists everywhere)."""
    col = ctx.col(x)
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm.cast("binary"))


@register("rolling_hash_fingerprint")
def _rolling_hash_fingerprint(ctx, x, window: int = 16):
    """Winnowing-style fingerprint: min xxhash64 over character
    k-gram windows — robust to local edits, one pass, JVM-side."""
    col = F.lower(ctx.col(x))
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - window + 1, F.lit(1)))
    hashes = F.transform(idx, lambda i: F.xxhash64(F.substring(col, i, window)))
    return F.array_min(hashes)


@register("url_host")
def _url_host(ctx, x):
    """Hostname of a URL column (Spark's built-in parse_url — JVM)."""
    return F.lower(F.parse_url(ctx.col(x), F.lit("HOST")))


@register("url_domain")
def _url_domain(ctx, x):
    """Registrable ('pay-level') domain of a URL via the real
    public-suffix-list algorithm — delegates to
    :func:`scale.urls.url_registrable_domain` (same vendored PSL
    snapshot, same pure-JVM when/isin chain), so the mutate-side
    function and the standalone sibling agree by construction on
    github.io, com.pl, IP literals, single labels, etc."""
    from .urls import url_registrable_domain

    return url_registrable_domain(ctx.col(x))


@register("winnow_fingerprints")
def _winnow_fingerprints(ctx, text, k: int = 8, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character k-gram,
    slide a w-hash window, keep each window's minimum hash; the
    DISTINCT selected hashes are the document's fingerprint set
    (array<bigint>). Guarantees every shared substring of length
    >= k + w - 1 contributes at least one common fingerprint, so
    fingerprint-set overlap lower-bounds substring-level copying —
    the standard local-similarity complement to MinHash's global
    Jaccard.

    All JVM higher-order functions (substring transform, sliding
    slice + array_min): one narrow map per document, no shuffle."""
    kk, ww = int(ctx.eval(k)), int(ctx.eval(w))
    s = F.lower(F.regexp_replace(ctx.col(text), r"\s+", " "))
    n_grams = F.greatest(F.length(s) - kk + 1, F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(F.substring(s, i, kk)),
    )
    n_wins = F.greatest(F.size(hashes) - ww + 1, F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.array_min(F.slice(hashes, i, ww)),
    )
    return F.array_sort(F.array_distinct(mins))


@register("fingerprint_overlap")
def _fingerprint_overlap(ctx, a, b):
    """|A ∩ B| / |A| of two fingerprint-set columns — the containment
    of a in b (how much of document a's content appears in b)."""
    aa, bb = ctx.col(a), ctx.col(b)
    inter = F.size(F.array_intersect(aa, bb))
    return F.when(F.size(aa) > 0, inter / F.size(aa))


@register("compression_ratio")
def _compression_ratio(ctx, x, level: int = 6):
    """zlib-compressed size / raw UTF-8 size — the RefinedWeb/CCNet
    repetitiveness signal: boilerplate and spammy near-repetition
    compress far below natural prose (~0.3-0.6), machine noise sits
    near 1.0. The one registry function that runs in Python — zlib has
    no JVM expression — but Arrow-batched (one pandas_udf), and the
    signal is per-row so it composes with filter_/mutate like every
    other metric. NULL/empty text yields NULL."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    lvl = int(ctx.eval(level)) if not isinstance(level, int) else level

    @pandas_udf("double")
    def _ratio(s):
        import pandas as pd

        def one(v):
            if v is None:
                return None
            raw = v.encode("utf-8", "replace")
            if not raw:
                return None
            return len(zlib.compress(raw, lvl)) / len(raw)

        return s.map(one)

    return _ratio(ctx.col(x))


def normalize_text(
    td,
    text="text",
    out_col: str | None = None,
    form: str | None = None,
    strip_control: bool = True,
    zero_width: bool = True,
    unify_spaces: bool = True,
    unify_punct: bool = True,
    collapse_whitespace: bool = False,
):
    """Unicode text normalization — the ftfy/Dolma-style cleanup pass a
    crawl runs BEFORE fingerprinting, so byte-level noise (zero-width
    characters, exotic spaces, curly quotes) doesn't defeat exact and
    near dedup. Knobs, all on by default except the lossy ones:

    - ``strip_control``: drop C0/C1 control characters except ``\\n``
      and ``\\t`` (terminal escapes, NULs from broken decoders).
    - ``zero_width``: drop ZWSP/ZWNJ/ZWJ/BOM/soft-hyphen — invisible
      codepoints that make visually identical strings hash apart.
    - ``unify_spaces``: map NBSP and the Unicode space block to ASCII
      space.
    - ``unify_punct``: curly quotes -> ASCII quotes, en/em dash and
      minus -> ``-``, ellipsis -> ``...``.
    - ``collapse_whitespace``: runs of spaces/tabs -> one space
      (newlines preserved — paragraph structure is load-bearing for
      ``dedup_paragraphs``). Off by default: it's lossy.
    - ``form``: ``"nfc"`` / ``"nfkc"`` full Unicode normalization via
      ``unicodedata`` in one Arrow pandas UDF — the ONLY knob that
      leaves the JVM; everything else compiles to ``translate`` /
      ``regexp_replace`` and runs inside the scan at any scale.

    ``out_col=None`` rewrites ``text`` in place. NULL stays NULL.
    Order: form -> control -> zero-width -> spaces -> punct ->
    collapse (NFKC first, so its expansions get cleaned too)."""
    from ..tibble import ensure_tibble

    td = ensure_tibble(td)
    tname = text if isinstance(text, str) else text._name
    dest = out_col or tname
    if out_col and out_col in td.columns:
        raise ValueError(
            f"normalize_text: column {out_col!r} already exists; pass a "
            f"different out_col"
        )
    col = F.col(tname)
    if form is not None:
        if form not in ("nfc", "nfkc", "nfd", "nfkd"):
            raise ValueError(
                f"normalize_text: form must be one of nfc/nfkc/nfd/nfkd "
                f"or None, got {form!r}"
            )
        from pyspark.sql.functions import pandas_udf

        uform = form.upper()

        @pandas_udf("string")
        def _unorm(s):
            import unicodedata

            return s.map(
                lambda v: unicodedata.normalize(uform, v)
                if v is not None
                else None
            )

        col = _unorm(col)
    if strip_control:
        # C0 except \t\n (+ \r), DEL, C1
        col = F.regexp_replace(
            col, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u0080-\\u009F]", ""
        )
    if zero_width:
        col = F.translate(
            col,
            "\u200b\u200c\u200d\u2060\ufeff\u00ad",
            "",
        )
    if unify_spaces:
        col = F.regexp_replace(
            col,
            "[\\u00A0\\u1680\\u2000-\\u200A\\u202F\\u205F\\u3000]",
            " ",
        )
    if unify_punct:
        col = F.translate(
            col,
            "\u2018\u2019\u201a\u201b\u201c\u201d\u201e\u201f"
            "\u2013\u2014\u2212\u00ab\u00bb",
            "''''\"\"\"\"---\"\"",
        )
        col = F.regexp_replace(col, "\u2026", "...")
    if collapse_whitespace:
        col = F.regexp_replace(col, "[ \\t]{2,}", " ")
    return td.with_df(td.df.withColumn(dest, col))


# HTML5 numeric-charref remaps (Python html._invalid_charrefs): the
# C1 range 0x80-0x9f reads through windows-1252, 0x00 and 0x0d are
# special-cased. Public spec: https://html.spec.whatwg.org/ 13.2.5.80
_CP1252_CHARREFS = {
    0x00: "\ufffd", 0x0D: "\r", 0x80: "€", 0x81: "\x81",
    0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
    0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰",
    0x8A: "Š", 0x8B: "‹", 0x8C: "Œ", 0x8D: "\x8d",
    0x8E: "Ž", 0x8F: "\x8f", 0x90: "\x90", 0x91: "‘",
    0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™",
    0x9A: "š", 0x9B: "›", 0x9C: "œ", 0x9D: "\x9d",
    0x9E: "ž", 0x9F: "Ÿ",
}

# decoded '&' (&#38;) becomes this private-use sentinel until the
# named-entity replaces have run, so numeric output can never seed a
# second decode ('&#38;lt;' must end as '&lt;', not '<')
_AMP_SENTINEL = "\ue000"


def _numeric_charref_decode(col: Column) -> Column:
    """Decode HTML numeric character references (``&#NN;`` /
    ``&#xHH;``, trailing semicolon optional) to their characters —
    entirely JVM-side, matching Python ``html.unescape``: full Unicode
    via ``decode(unhex(lpad(hex(cp), 8)), 'UTF-32')``, the HTML5
    windows-1252 remap of the C1 range, U+FFFD for out-of-range and
    surrogate codepoints, and removal of noncharacters.

    Shape: a lookahead split puts each candidate reference at the head
    of its own chunk; a ``transform`` decodes chunk heads and
    ``array_join`` reassembles — one pass over the string, no UDF."""
    parts = F.split(col, r"(?=&#)")

    def _chunk(p: Column) -> Column:
        # leading zeros stripped BEFORE the length-overflow guard so
        # '&#000000039;' still decodes (the guard sees 2 digits, not 9)
        dec = F.regexp_replace(
            F.regexp_extract(p, r"^&#([0-9]+)", 1), r"^0+(?=.)", ""
        )
        hx = F.regexp_replace(
            F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]+)", 1),
            r"^0+(?=.)",
            "",
        )
        # >8 digits can't fit a valid codepoint: clamp to the
        # out-of-range sentinel instead of overflowing the cast
        too_big = F.lit(0x110000).cast("long")
        cp = F.when(
            F.length(dec) > 0,
            F.when(F.length(dec) > 8, too_big).otherwise(
                dec.cast("long")
            ),
        ).otherwise(
            F.when(F.length(hx) > 8, too_big).otherwise(
                F.conv(hx, 16, 10).cast("long")
            )
        )
        ch = F.when(cp == 38, F.lit(_AMP_SENTINEL))
        for k, v in _CP1252_CHARREFS.items():
            ch = ch.when(cp == k, F.lit(v))
        ch = ch.when(
            (cp > 0x10FFFF) | ((cp >= 0xD800) & (cp <= 0xDFFF)),
            F.lit("\ufffd"),
        )
        noncharacter = (
            ((cp >= 0x01) & (cp <= 0x08))
            | (cp == 0x0B)
            | ((cp >= 0x0E) & (cp <= 0x1F))
            | (cp == 0x7F)
            | ((cp >= 0xFDD0) & (cp <= 0xFDEF))
            | (cp.bitwiseAND(F.lit(0xFFFE).cast("long")) == 0xFFFE)
        )
        ch = ch.when(noncharacter, F.lit(""))
        ch = ch.otherwise(
            F.decode(F.unhex(F.lpad(F.hex(cp), 8, "0")), "UTF-32")
        )
        rest = F.regexp_replace(
            p, r"^&#([0-9]+|[xX][0-9a-fA-F]+);?", ""
        )
        return F.when(
            p.rlike(r"^&#([0-9]+|[xX][0-9a-fA-F]+)"),
            F.concat(ch, rest),
        ).otherwise(p)

    return F.when(
        col.contains("&#"),
        F.array_join(F.transform(parts, _chunk), ""),
    ).otherwise(col)


def html_to_text(
    td,
    html: str = "html",
    out_col: str = "text",
    full_entities: bool = False,
):
    """HTML -> text extraction (the WET-style step between a raw crawl
    and every text op in this module): strips comments and
    script/style/noscript/template blocks, turns block-level closes
    and <br>/<hr> into newlines (so paragraph structure survives for
    ``dedup_paragraphs``), removes remaining tags, decodes the common
    named entities, and normalizes whitespace (runs of spaces -> one,
    3+ newlines -> a blank line). A documented REGEX extractor, not an
    HTML parser — the right scan-stage tradeoff for crawl-scale
    boilerplate text; malformed markup degrades to leftover text, not
    errors. NULL in -> NULL out.

    Everything compiles to JVM expressions. Numeric character
    references (``&#NN;`` / ``&#xHH;``) decode FULLY in default mode —
    all of Unicode with html.unescape's HTML5 semantics, see
    :func:`_numeric_charref_decode` — alongside the common named
    entities; only ``full_entities=True`` (the long named-entity tail
    via ``html.unescape``) crosses into one Arrow pass, mirroring
    ``normalize_text(form=)``. Known one-pass deviation in default
    mode: text containing the private-use sentinel U+E000 would be
    rewritten to '&' (never seen in real HTML)."""
    from ..tibble import ensure_tibble

    td = ensure_tibble(td)
    hname = html if isinstance(html, str) else html._name
    if out_col != hname and out_col in td.columns:
        raise ValueError(
            f"html_to_text: column {out_col!r} already exists; pass a "
            f"different out_col"
        )
    col = F.col(hname)
    # invisible content first (payload must not leak into text)
    col = F.regexp_replace(col, r"(?s)<!--.*?-->", "")
    for tag in ("script", "style", "noscript", "template"):
        col = F.regexp_replace(
            col, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", ""
        )
    # block structure BEFORE tag stripping: paragraph-level closes
    # become blank lines (the \n\n boundaries dedup_paragraphs keys
    # on); line-level breaks become single newlines
    col = F.regexp_replace(
        col,
        r"(?i)</(p|div|section|article|ul|ol|h[1-6]|tr|table|"
        r"blockquote|pre|figure|header|footer|title)\s*>",
        "\n\n",
    )
    col = F.regexp_replace(col, r"(?i)</(li|td|th)\s*>|<(br|hr)\s*/?\s*>", "\n")
    col = F.regexp_replace(col, r"(?s)<[^>]+>", "")
    if full_entities:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _unescape(s):
            import html as _html

            return s.map(
                lambda v: _html.unescape(v) if v is not None else None
            )

        col = _unescape(col)
    else:
        # numeric refs first (decoded '&' parks on a sentinel so it
        # can't seed the named replaces), then common named entities;
        # '&amp;' last so '&amp;lt;' stays '&lt;' — one-pass semantics
        col = _numeric_charref_decode(col)
        for ent, rep in (
            ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
            ("&quot;", "\""), ("&apos;", "'"),
            ("&amp;", "&"),
        ):
            col = F.replace(col, F.lit(ent), F.lit(rep))
        col = F.replace(col, F.lit(_AMP_SENTINEL), F.lit("&"))
    # whitespace normalization: spaces collapse, newlines keep at most
    # one blank line, edges trimmed
    col = F.regexp_replace(col, r"[ \t\x0B\r]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{3,}", "\n\n")
    col = F.regexp_replace(col, r"^\s+|\s+$", "")
    col = F.when(F.col(hname).isNull(), F.lit(None).cast("string")).otherwise(
        col
    )
    return td.with_df(td.df.withColumn(out_col, col))


def html_extract_links(td, html: str = "html", out_col: str = "link"):
    """One output row per ``href`` value in each document's markup —
    the crawl-graph feeder (``host_graph`` -> ``pagerank`` turns these
    into the domain-authority quality prior). Same REGEX-extractor
    contract as :func:`html_to_text`: one JVM
    ``regexp_extract_all`` + ``explode``, no HTML parser, malformed
    markup degrades to missed/extra links, never errors. Quoted and
    bare attribute values both match; fragment-only links (``#...``)
    are skipped; documents with no links produce no rows (explode, not
    explode_outer — a link graph has no use for NULL edges)."""
    from ..tibble import Tibble, ensure_tibble

    td = ensure_tibble(td)
    hname = html if isinstance(html, str) else html._name
    if out_col in td.columns:
        raise ValueError(
            f"html_extract_links: column {out_col!r} already exists; "
            f"pass a different out_col"
        )
    links = F.regexp_extract_all(
        F.col(hname),
        F.lit(r'(?i)\bhref\s*=\s*(?:"([^"#][^"]*)"|' r"'([^'#][^']*)'"
              r"|([^\s\"'<>#][^\s\"'<>]*))"),
        0,
    )
    # the 3-alternative pattern can't share one group index in
    # regexp_extract_all, so extract the full attr match and strip the
    # prefix/quotes with one more regexp
    clean = F.transform(
        links,
        lambda m: F.regexp_replace(
            F.regexp_replace(m, r"(?i)^\bhref\s*=\s*", ""),
            r"""^["']|["']$""", "",
        ),
    )
    out = td.df.select(
        *td.columns, F.explode(clean).alias(out_col)
    ).filter(F.length(out_col) > 0)
    return Tibble(out)
