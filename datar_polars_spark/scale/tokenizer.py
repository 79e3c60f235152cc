"""Trainable byte-pair-encoding tokenizer, Spark-first.

Exact context-length budgets (``chunk_documents(token_counts=)``,
``pack_documents``) need the REAL tokenizer's per-word costs, not a
corpus-average ratio. This module provides a self-contained BPE so a
pipeline can train, ship, and apply one without any external tokenizer
library:

- ``bpe_train`` — the corpus never collects: word frequencies come
  from a distributed explode → groupBy → top-K aggregation (the
  classic BPE training input is exactly that word-frequency table),
  and only the bounded frequency table reaches the driver, where the
  standard greedy pair-merge loop runs. Deterministic: ties break
  lexicographically, so the same corpus always trains the same vocab.
- ``bpe_token_counts`` — one Arrow pass producing the per-WORD token
  cost array that ``chunk_documents(token_counts=)`` bin-packs; each
  batch memoizes distinct words, so the per-row cost is a dict hit for
  every repeated word.
- ``bpe_encode`` — the token strings themselves (array<string>), for
  inspection/debugging and vocabulary analytics.

The merge table is a JSON-able dict (like the IVF-PQ index), tiny
enough to ship in UDF closures; cite: the algorithm is standard BPE
(Sennrich et al. 2016) with a GPT-2-style end-of-word marker.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column  # noqa: F401 (signature typing)
from pyspark.sql import functions as F

from ..tibble import Tibble, ensure_tibble

__all__ = [
    "bpe_train", "bpe_encode", "bpe_encode_ids", "bpe_token_counts",
    "bpe_apply_word", "bpe_decode_ids", "bpe_write", "bpe_read",
]

_EOW = ""  # end-of-word sentinel (control char: never in text words)


def _name_of(x: Any) -> str:
    return x._name if hasattr(x, "_name") else str(x)


def bpe_train(
    td: Any,
    text: Any = "text",
    n_merges: int = 1000,
    max_words: int = 200_000,
    lowercase: bool = True,
) -> dict:
    """Train BPE merges on a corpus. Returns ``{"merges": [[a, b],
    ...], "lowercase": bool, "version": 1}`` — JSON-able, ordered, and
    deterministic (pair-frequency ties break lexicographically).

    100 TB shape: the word-frequency table is a distributed explode →
    groupBy(word) → count; only the ``max_words`` most frequent words
    (one keyed shuffle + a TakeOrdered) reach the driver, where the
    greedy merge loop runs over that bounded table. Truncating the
    long tail of rare words barely moves pair statistics (frequencies
    are Zipfian), which is why every practical BPE trainer does the
    same."""
    td = ensure_tibble(td)
    tname = _name_of(text)
    col = F.col(tname)
    if lowercase:
        col = F.lower(col)
    words = F.explode(
        F.filter(
            F.split(F.trim(F.coalesce(col, F.lit(""))), r"\s+"),
            lambda t: F.length(t) > 0,
        )
    ).alias("w")
    freq_rows = (
        td.df.select(words)
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    if not freq_rows:
        raise ValueError("bpe_train: no words to train on")
    # word id -> (symbol list, count); the EOW marker makes merges
    # word-boundary-aware (GPT-2 style). Pair statistics are maintained
    # INCREMENTALLY (pair -> count, pair -> word ids containing it):
    # each merge rewrites only the words that contain the merged pair,
    # so training is O(total rewrites), not O(n_merges x vocab) — the
    # difference between seconds and hours at max_words=200k.
    words_syms: list[list[str]] = []
    words_cnt: list[int] = []
    seen: dict[tuple, int] = {}
    for r in freq_rows:
        syms = tuple(r["w"]) + (_EOW,)
        if syms in seen:
            words_cnt[seen[syms]] += int(r["count"])
        else:
            seen[syms] = len(words_syms)
            words_syms.append(list(syms))
            words_cnt.append(int(r["count"]))
    pair_counts: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for wi, syms in enumerate(words_syms):
        cnt = words_cnt[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wi)

    def _bump(p: tuple, delta: int, wi: int) -> None:
        c = pair_counts.get(p, 0) + delta
        if c > 0:
            pair_counts[p] = c
            if delta > 0:
                pair_words.setdefault(p, set()).add(wi)
        else:
            pair_counts.pop(p, None)
            pair_words.pop(p, None)

    merges: list[list[str]] = []
    for _ in range(int(n_merges)):
        if not pair_counts:
            break
        # deterministic argmax: highest count, then lexicographic
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        a, b = best
        ab = a + b
        for wi in sorted(pair_words.get(best, ())):
            syms = words_syms[wi]
            cnt = words_cnt[wi]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    # retire the old neighbor pairs, admit the new ones
                    if out:
                        _bump((out[-1], a), -cnt, wi)
                        _bump((out[-1], ab), cnt, wi)
                    if i + 2 < len(syms):
                        nxt = syms[i + 2]
                        # the right neighbor pair is corrected on the
                        # NEXT loop step if it is itself (a, b)
                        _bump((b, nxt), -cnt, wi)
                        _bump((ab, nxt), cnt, wi)
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words_syms[wi] = out
        # every occurrence of the merged pair is gone by construction
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        merges.append([a, b])

    # r11: stable integer-id vocabulary. Downstream packing/training
    # wants ids, not strings — the vocab enumerates every surface
    # token this model can emit on its training alphabet, in the
    # Sennrich convention: each token exists in a word-internal form
    # and a word-final '</w>' form (the boundary info the id stream
    # needs to decode back to text). ids 0/1 are the unknown-token
    # fallbacks for characters never seen in training.
    alphabet = sorted({ch for syms in seen for ch in syms if ch != _EOW})
    vocab: list[str] = ["<unk>", "<unk></w>"]
    vseen = set(vocab)
    for ch in alphabet:
        for cand in (ch, ch + "</w>"):
            if cand not in vseen:
                vseen.add(cand)
                vocab.append(cand)
    for a, b in merges:
        s = (a + b).replace(_EOW, "")
        if not s:
            continue
        for cand in (s, s + "</w>"):
            if cand not in vseen:
                vseen.add(cand)
                vocab.append(cand)
    return {
        "merges": merges,
        "vocab": vocab,
        "lowercase": bool(lowercase),
        "version": 1,
    }


def bpe_apply_word(word: str, ranks: dict, cache: dict | None = None) -> list:
    """Tokenize ONE word with a trained merge-rank table (lowest rank
    merges first — the standard BPE inference order). Pure function,
    importable for tests; ``cache`` memoizes across calls."""
    if cache is not None and word in cache:
        return cache[word]
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    # surface form: strip the EOW marker (a bare trailing marker token
    # still counts — it closed the word)
    out = [s.replace(_EOW, "") for s in syms]
    out = [s for s in out if s] or [""]
    if cache is not None:
        cache[word] = out
    return out


def _ranks(model: dict) -> dict:
    if not (isinstance(model, dict) and "merges" in model):
        raise ValueError(
            "expected the dict bpe_train returned (key 'merges')"
        )
    return {(a, b): i for i, (a, b) in enumerate(model["merges"])}


def _words_expr(tname: str, lowercase: bool):
    col = F.col(tname)
    if lowercase:
        col = F.lower(col)
    return F.filter(
        F.split(F.trim(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def bpe_token_counts(
    td: Any,
    model: dict,
    text: Any = "text",
    counts_col: str = "bpe_counts",
) -> Tibble:
    """Per-WORD BPE token cost array — exactly the shape
    ``chunk_documents(token_counts=)`` bin-packs and
    ``pack_documents`` budgets against (after ``aggregate``-summing).
    One Arrow pass; distinct words memoize within each batch, so
    Zipfian text costs ~one BPE run per distinct word. NULL/empty text
    yields an empty array (zero words)."""
    td = ensure_tibble(td)
    tname = _name_of(text)
    if counts_col in td.columns:
        raise ValueError(
            f"bpe_token_counts: column {counts_col!r} already exists; "
            f"pass a different counts_col="
        )
    ranks = _ranks(model)
    lowercase = bool(model.get("lowercase", True))

    @F.pandas_udf("array<int>")
    def counts(words_ser):
        import pandas as pd

        cache: dict = {}
        out = []
        for ws in words_ser:
            if ws is None:
                out.append([])
                continue
            out.append(
                [len(bpe_apply_word(w, ranks, cache)) for w in ws]
            )
        return pd.Series(out)

    out_df = td.df.withColumn(
        counts_col, counts(_words_expr(tname, lowercase))
    )
    return td.with_df(out_df)


def bpe_encode(
    td: Any,
    model: dict,
    text: Any = "text",
    tokens_col: str = "bpe_tokens",
) -> Tibble:
    """The token strings themselves (array<string>, whole document) —
    for inspection and vocabulary analytics. Same Arrow/memoization
    shape as :func:`bpe_token_counts`."""
    td = ensure_tibble(td)
    tname = _name_of(text)
    if tokens_col in td.columns:
        raise ValueError(
            f"bpe_encode: column {tokens_col!r} already exists; pass a "
            f"different tokens_col="
        )
    ranks = _ranks(model)
    lowercase = bool(model.get("lowercase", True))

    @F.pandas_udf("array<string>")
    def encode(words_ser):
        import pandas as pd

        cache: dict = {}
        out = []
        for ws in words_ser:
            if ws is None:
                out.append([])
                continue
            toks: list = []
            for w in ws:
                toks.extend(bpe_apply_word(w, ranks, cache))
            out.append(toks)
        return pd.Series(out)

    out_df = td.df.withColumn(
        tokens_col, encode(_words_expr(tname, lowercase))
    )
    return td.with_df(out_df)


def _vocab_map(model: dict) -> dict:
    vocab = model.get("vocab")
    if not vocab:
        raise ValueError(
            "this model has no 'vocab' table (trained before ids "
            "support) — retrain with bpe_train to get stable ids"
        )
    return {t: i for i, t in enumerate(vocab)}


def bpe_encode_ids(
    td: Any,
    model: dict,
    text: Any = "text",
    ids_col: str = "bpe_ids",
) -> Tibble:
    """Stable integer token ids (array<int>, whole document) — the
    form packing/training pipelines consume. Word-final tokens map to
    their ``</w>`` vocab entry, so the id stream round-trips to text
    via :func:`bpe_decode_ids` (under the model's lowercase +
    whitespace normalization); characters outside the training
    alphabet hit the ``<unk>``/``<unk></w>`` ids (0/1). Same
    Arrow/memoization shape as :func:`bpe_token_counts`, and the id
    count per document equals its token count exactly."""
    td = ensure_tibble(td)
    tname = _name_of(text)
    if ids_col in td.columns:
        raise ValueError(
            f"bpe_encode_ids: column {ids_col!r} already exists; pass "
            f"a different ids_col="
        )
    ranks = _ranks(model)
    vmap = _vocab_map(model)
    lowercase = bool(model.get("lowercase", True))

    @F.pandas_udf("array<int>")
    def encode_ids(words_ser):
        import pandas as pd

        cache: dict = {}
        out = []
        for ws in words_ser:
            if ws is None:
                out.append([])
                continue
            ids: list = []
            for w in ws:
                toks = bpe_apply_word(w, ranks, cache)
                ids.extend(vmap.get(t, 0) for t in toks[:-1])
                ids.append(vmap.get(toks[-1] + "</w>", 1))
            out.append(ids)
        return pd.Series(out)

    out_df = td.df.withColumn(
        ids_col, encode_ids(_words_expr(tname, lowercase))
    )
    return td.with_df(out_df)


def bpe_decode_ids(ids, model: dict) -> str:
    """Rebuild text from a :func:`bpe_encode_ids` stream: ``</w>``
    entries close a word, words join with single spaces (the inverse
    of the trainer's whitespace normalization). Pure driver-side
    function — the inspection/round-trip tool, not a distributed op."""
    vocab = model.get("vocab")
    if not vocab:
        raise ValueError("model has no 'vocab' table")
    words: list = []
    cur: list = []
    for i in ids:
        t = vocab[i] if 0 <= int(i) < len(vocab) else "<unk>"
        if t.endswith("</w>"):
            cur.append(t[:-4])
            words.append("".join(cur))
            cur = []
        else:
            cur.append(t)
    if cur:
        words.append("".join(cur))
    return " ".join(words)


def bpe_write(spark, model: dict, path: str) -> None:
    """Persist a trained BPE model as a single JSON file on any
    Hadoop-supported filesystem (file://, hdfs://, s3a://), so the
    tokenizer that budgeted a dataset ships WITH the dataset."""
    if not (isinstance(model, dict) and "merges" in model):
        raise ValueError(
            "bpe_write: expected the dict bpe_train returned "
            "(key 'merges')"
        )
    from .jsonio import write_json_file

    write_json_file(spark, path, {"format": "bpe-model", **model})


def bpe_read(spark, path: str) -> dict:
    """Load a model :func:`bpe_write` persisted — equal to the trained
    dict (JSON round-trips the merge strings exactly)."""
    from .jsonio import read_json_file

    loaded = read_json_file(spark, path)
    if loaded.get("format") != "bpe-model" or "merges" not in loaded:
        raise ValueError(f"{path} is not a bpe_write artifact")
    loaded.pop("format")
    loaded["merges"] = [list(m) for m in loaded["merges"]]
    return loaded
