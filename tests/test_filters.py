"""Training-data quality filters: Gopher repetition metrics, C4 line
cleanup, n-gram decontamination, PII redaction, sequence packing."""

import pytest

from datar_polars_spark import Tibble, f, arrange, filter_, mutate, pull, tibble
from datar_polars_spark.functions import builder
from datar_polars_spark.scale import (
    c4_clean,
    contamination_report,
    decontaminate,
    gopher_quality_filter,
    pack_documents,
)

dup_line_fraction = builder("dup_line_fraction")
dup_paragraph_fraction = builder("dup_paragraph_fraction")
dup_line_char_fraction = builder("dup_line_char_fraction")
top_ngram_char_fraction = builder("top_ngram_char_fraction")
dup_ngram_char_fraction = builder("dup_ngram_char_fraction")
symbol_word_ratio = builder("symbol_word_ratio")
bullet_line_fraction = builder("bullet_line_fraction")
alpha_word_ratio = builder("alpha_word_ratio")
redact_pii = builder("redact_pii")


def col(t, name):
    return list(t.collect()[name])


# ---- repetition metrics ---------------------------------------------------

def test_dup_line_fraction(spark):
    t = tibble(
        spark,
        text=["a line\nb line\na line\nc line", "x\ny\nz", ""],
    )
    out = t >> mutate(d=dup_line_fraction(f.text))
    vals = col(out, "d")
    assert vals[0] == pytest.approx(0.25)  # 4 lines, 3 distinct
    assert vals[1] == 0.0
    assert vals[2] == 0.0


def test_dup_paragraph_fraction(spark):
    t = tibble(spark, text=["p1\n\np2\n\np1", "solo"])
    out = t >> mutate(d=dup_paragraph_fraction(f.text))
    assert col(out, "d")[0] == pytest.approx(1 / 3)


def test_dup_line_char_fraction(spark):
    # "aa" twice (4 chars duplicated), "b" once → 4/5
    t = tibble(spark, text=["aa\nb\naa"])
    out = t >> mutate(d=dup_line_char_fraction(f.text))
    assert col(out, "d")[0] == pytest.approx(4 / 5)


def test_top_ngram_char_fraction(spark):
    t = tibble(spark, text=["spam ham spam ham spam ham"])
    out = t >> mutate(r=top_ngram_char_fraction(f.text, 2))
    # bigrams: 'spam ham' x3 (8 chars each), 'ham spam' x2; top covers 24/26
    assert col(out, "r")[0] == pytest.approx(24 / 26)


def test_dup_ngram_char_fraction_zero_for_unique(spark):
    t = tibble(spark, text=["one two three four five six seven eight"])
    out = t >> mutate(r=dup_ngram_char_fraction(f.text, 5))
    assert col(out, "r")[0] == 0.0


def test_symbol_word_ratio(spark):
    t = tibble(spark, text=["# hello # world"])
    out = t >> mutate(r=symbol_word_ratio(f.text, "#"))
    assert col(out, "r")[0] == pytest.approx(2 / 2)  # 2 '#', 2 words


def test_bullet_and_alpha(spark):
    t = tibble(spark, text=["- a\n- b\nplain c"])
    out = t >> mutate(b=bullet_line_fraction(f.text), a=alpha_word_ratio(f.text))
    assert col(out, "b")[0] == pytest.approx(2 / 3)
    assert col(out, "a")[0] < 1.0  # '-' tokens carry no letters


def test_redact_pii(spark):
    t = tibble(
        spark,
        text=["mail me at joe@example.com or call 555-123-4567 from 10.0.0.1"],
    )
    out = t >> mutate(text=redact_pii(f.text))
    v = col(out, "text")[0]
    assert "<EMAIL>" in v and "<PHONE>" in v and "<IP>" in v
    assert "joe@" not in v and "10.0.0.1" not in v


# ---- gopher composite -----------------------------------------------------

def _make_docs(spark):
    good = " ".join(f"alpha{i} beta{i} gamma{i} delta{i}" for i in range(15))
    reps = "repeat line\n" * 40
    short = "too short"
    return tibble(spark, doc_id=[1, 2, 3], text=[good, reps, short])


def test_gopher_filter_drops_bad(spark):
    t = _make_docs(spark)
    out = t >> gopher_quality_filter(text="text", min_words=20)
    assert col(out, "doc_id") == [1]


def test_gopher_flags_mode(spark):
    t = _make_docs(spark)
    out = t >> gopher_quality_filter(text="text", min_words=20, keep_flags=True)
    pdf = out.collect()
    assert "ok_word_count" in pdf.columns and len(pdf) == 3
    flags = pdf.set_index("doc_id")
    assert not flags.loc[2, "ok_dup_lines"]
    assert not flags.loc[3, "ok_word_count"]


# ---- c4 clean -------------------------------------------------------------

def test_c4_clean_lines(spark):
    t = tibble(
        spark,
        doc_id=[1, 2, 3],
        text=[
            "This is a proper sentence.\nshort\nAnother good line here!",
            "code sample {\nreturn 1;\n}",
            "totally lorem ipsum filler text here.",
        ],
    )
    out = t >> c4_clean(text="text")
    pdf = out.collect()
    assert list(pdf["doc_id"]) == [1]
    assert pdf["text"][0] == "This is a proper sentence.\nAnother good line here!"


# ---- decontamination ------------------------------------------------------

def test_contamination_and_decontaminate(spark):
    secret = "alpha beta gamma delta epsilon"
    corpus = tibble(
        spark,
        doc_id=[1, 2],
        text=[f"prefix {secret} suffix words", "clean document with other words"],
    )
    bench = tibble(spark, text=[secret])
    rep = corpus >> contamination_report(bench, text="text", id="doc_id", n=5)
    pdf = rep.collect().set_index("doc_id")
    assert pdf.loc[1, "contaminated_ngrams"] >= 1
    assert pdf.loc[2, "contaminated_ngrams"] == 0
    clean = corpus >> decontaminate(bench, text="text", id="doc_id", n=5)
    assert col(clean, "doc_id") == [2]


# ---- packing --------------------------------------------------------------

def test_pack_documents_chunk(spark):
    t = tibble(spark, doc_id=[1, 2, 3, 4, 5], n_tokens=[100, 100, 100, 100, 100])
    out = t >> pack_documents(tokens="n_tokens", budget=250, mode="chunk")
    pdf = out.collect().sort_values("doc_id")
    # exclusive cumsum: 0,100,200,300,400 → packs 0,0,0,1,1
    assert list(pdf["pack_id"]) == [0, 0, 0, 1, 1]


def test_pack_documents_chunk_grouped(spark):
    t = tibble(
        spark,
        grp=["a", "a", "b", "b"],
        doc_id=[1, 2, 3, 4],
        n_tokens=[200, 200, 200, 200],
    )
    out = t >> pack_documents(tokens="n_tokens", budget=300, by="grp")
    pdf = out.collect().sort_values("doc_id")
    assert list(pdf["pack_id"]) == [0, 0, 0, 0]  # resets per group


def test_pack_documents_greedy(spark):
    t = tibble(
        spark,
        grp=["g"] * 5,
        doc_id=[1, 2, 3, 4, 5],
        n_tokens=[900, 700, 300, 100, 100],
    )
    out = t >> pack_documents(tokens="n_tokens", budget=1000, by="grp", mode="greedy")
    pdf = out.collect()
    sums = pdf.groupby("pack_id")["n_tokens"].sum()
    assert (sums <= 1000).all()
    assert len(pdf) == 5
    # FFD: [900,100], [700,300], [100] → 3 packs
    assert pdf["pack_id"].nunique() == 3


# ---- dataset splits -------------------------------------------------------

def test_hash_split_deterministic_and_disjoint(spark):
    from datar_polars_spark.scale import hash_split

    t = tibble(spark, doc_id=list(range(1000)))
    a = (t >> hash_split(id="doc_id")).collect()
    b = (t >> hash_split(id="doc_id")).collect()
    assert a["split"].tolist() == b["split"].tolist()  # pure function of id
    counts = a["split"].value_counts()
    assert counts.get("train", 0) > 900  # ~98%
    assert set(counts.index) <= {"train", "val", "test"}


def test_hash_split_custom_weights(spark):
    from datar_polars_spark.scale import hash_split

    t = tibble(spark, doc_id=list(range(2000)))
    out = (t >> hash_split(id="doc_id", weights={"a": 0.5, "b": 0.5})).collect()
    counts = out["split"].value_counts()
    assert abs(counts["a"] - counts["b"]) < 300  # roughly balanced


def test_stratified_sample(spark):
    from datar_polars_spark.scale import stratified_sample

    t = tibble(spark, g=["x"] * 500 + ["y"] * 500, v=list(range(1000)))
    out = (t >> stratified_sample(by="g", fractions={"x": 0.1, "y": 0.9})).collect()
    cx = (out["g"] == "x").sum()
    cy = (out["g"] == "y").sum()
    assert cx < 150 and cy > 350  # fractions respected per stratum


# ---- chunk_documents (r7): context-length chunking with overlap -----------

class TestChunkDocuments:
    def _mk(self, spark, docs):
        from datar_polars_spark.tibble import ensure_tibble

        return ensure_tibble(
            spark.createDataFrame(docs, "doc_id int, text string")
        )

    def _oracle(self, text, max_tokens, overlap):
        toks = text.strip().split()
        if len(toks) <= max_tokens:
            return [(" ".join(toks), len(toks))]
        step = max_tokens - overlap
        out = []
        i = 0
        while True:
            w = toks[i : i + max_tokens]
            out.append((" ".join(w), len(w)))
            if i + max_tokens >= len(toks):
                break
            i += step
        return out

    def test_matches_oracle_fuzz(self, spark):
        import random

        from datar_polars_spark.scale import chunk_documents

        rng = random.Random(5)
        docs = [
            (i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(rng.randint(0, 40))))
            for i in range(25)
        ]
        td = self._mk(spark, docs)
        for max_tokens, overlap in ((8, 0), (8, 3), (5, 4), (100, 10)):
            got = {}
            rows = chunk_documents(
                td, max_tokens=max_tokens, overlap=overlap
            ).df.collect()
            for r in rows:
                got.setdefault(r["doc_id"], []).append(
                    (r["chunk_id"], r["text"], r["chunk_tokens"])
                )
            for i, t in docs:
                want = self._oracle(t, max_tokens, overlap)
                have = [
                    (c[1], c[2]) for c in sorted(got[i])
                ]
                assert have == want, (i, max_tokens, overlap, have, want)

    def test_overlap_property(self, spark):
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"t{i}" for i in range(23))
        td = self._mk(spark, [(1, text)])
        rows = sorted(
            chunk_documents(td, max_tokens=10, overlap=4).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        for a, b in zip(rows, rows[1:]):
            ta, tb = a["text"].split(), b["text"].split()
            assert ta[-4:] == tb[:4]  # consecutive chunks share `overlap`

    def test_reconstruction(self, spark):
        """Dropping each chunk's first `overlap` tokens (after chunk 0)
        and concatenating reproduces the document's token stream."""
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"x{i}" for i in range(57))
        td = self._mk(spark, [(1, text)])
        rows = sorted(
            chunk_documents(td, max_tokens=12, overlap=5).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        rebuilt = rows[0]["text"].split()
        for r in rows[1:]:
            rebuilt += r["text"].split()[5:]
        assert rebuilt == text.split()

    def test_short_and_empty_docs_pass_through(self, spark):
        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, "just five words in here"), (2, "   ")])
        rows = chunk_documents(td, max_tokens=100).df.collect()
        by = {r["doc_id"]: r for r in rows}
        assert by[1]["chunk_id"] == 0 and by[1]["text"] == "just five words in here"
        assert by[1]["chunk_tokens"] == 5
        assert by[2]["chunk_id"] == 0 and by[2]["text"] == ""

    def test_validation_and_plan(self, spark):
        import pytest as _pytest

        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, "a b c")])
        with _pytest.raises(ValueError, match="overlap"):
            chunk_documents(td, max_tokens=5, overlap=5)
        out = chunk_documents(td, max_tokens=2, overlap=1)
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow 1->N map, no shuffle
        assert "BatchEvalPython" not in plan
        assert "Generate" in plan  # the posexplode


def test_chunk_documents_null_text(spark):
    from datar_polars_spark.scale import chunk_documents
    from datar_polars_spark.tibble import ensure_tibble

    td = ensure_tibble(
        spark.createDataFrame([(1, None), (2, "a b")], "doc_id int, text string")
    )
    rows = {r["doc_id"]: r for r in chunk_documents(td, max_tokens=10).df.collect()}
    assert rows[1]["chunk_id"] == 0 and rows[1]["chunk_tokens"] == 0
    assert rows[1]["text"] == ""
    assert rows[2]["chunk_tokens"] == 2


def test_chunk_documents_column_collision_raises(spark):
    """ADVICE r8: frames already carrying the output / scratch names
    must fail fast with a clear message, not an ambiguous-reference
    AnalysisException downstream."""
    from datar_polars_spark.scale import chunk_documents
    from datar_polars_spark.tibble import ensure_tibble

    base = [(1, "a b c", 9)]
    td = ensure_tibble(
        spark.createDataFrame(base, "doc_id int, text string, chunk_id int")
    )
    with pytest.raises(ValueError, match="chunk_id"):
        chunk_documents(td, max_tokens=2)
    td2 = ensure_tibble(
        spark.createDataFrame(base, "doc_id int, text string, chunk_tokens int")
    )
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(td2, max_tokens=2)
    td3 = ensure_tibble(
        spark.createDataFrame(base, "doc_id int, text string, __ch int")
    )
    with pytest.raises(ValueError, match="reserved scratch"):
        chunk_documents(td3, max_tokens=2)
    td4 = ensure_tibble(
        spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    )
    with pytest.raises(ValueError, match="must differ"):
        chunk_documents(td4, max_tokens=2, chunk_col="c", tokens_col="c")
    # renaming the outputs around an occupied default works
    out = chunk_documents(
        td, max_tokens=2, chunk_col="win_id", tokens_col="win_tokens"
    ).df.collect()
    assert {r["win_id"] for r in out} == {0, 1}


class TestTokenizerHonestBudgets:
    """r9: BPE-aware budgets — chunk_documents' tokens_per_word ratio
    and pack_documents' precomputed-count contract."""

    def _mk(self, spark, docs):
        from datar_polars_spark.tibble import ensure_tibble

        return ensure_tibble(
            spark.createDataFrame(docs, "doc_id int, text string")
        )

    def test_ratio_equals_shrunk_word_budget(self, spark):
        """tokens_per_word=r must chunk EXACTLY like a word budget of
        floor(max_tokens / r) with an overlap of ceil(overlap / r) —
        the window floors (fit the budget), the overlap ceils (carry
        at least the requested context)."""
        from datar_polars_spark.scale import chunk_documents

        import random

        rng = random.Random(11)
        docs = [
            (i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(rng.randint(0, 60))))
            for i in range(15)
        ]
        td = self._mk(spark, docs)
        key = lambda r: (r["doc_id"], r["chunk_id"])  # noqa: E731
        got = sorted(
            chunk_documents(td, max_tokens=16, overlap=4, tokens_per_word=2.6).df.collect(),
            key=key,
        )
        want = sorted(
            chunk_documents(td, max_tokens=6, overlap=2).df.collect(), key=key
        )
        assert [(r["doc_id"], r["chunk_id"], r["text"], r["chunk_tokens"]) for r in got] \
            == [(r["doc_id"], r["chunk_id"], r["text"], r["chunk_tokens"]) for r in want]

    def test_overlap_ceils_so_context_is_never_underdelivered(self, spark):
        """overlap=4 at tokens_per_word=2.6 must carry 2 words (~5.2
        estimated tokens >= 4 requested), not floor's 1 word (~2.6 <
        4): consecutive chunks share ceil(overlap/ratio) words."""
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"t{i}" for i in range(40))
        td = self._mk(spark, [(1, text)])
        rows = sorted(
            chunk_documents(
                td, max_tokens=16, overlap=4, tokens_per_word=2.6
            ).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        assert len(rows) > 1
        for prev, cur in zip(rows, rows[1:]):
            pw, cw = prev["text"].split(), cur["text"].split()
            shared = max(
                (k for k in range(1, min(len(pw), len(cw)) + 1)
                 if pw[-k:] == cw[:k]),
                default=0,
            )
            # carried words * ratio must meet or beat the requested
            # token overlap (ceil direction)
            assert shared * 2.6 >= 4
            # and the window budget still holds
            assert len(cur["text"].split()) * 2.6 <= 16 + 1e-9

    def test_every_chunk_fits_the_bpe_budget(self, spark):
        """With ratio r, every chunk's words * r stays <= max_tokens."""
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"t{i}" for i in range(200))
        td = self._mk(spark, [(1, text)])
        rows = chunk_documents(td, max_tokens=50, tokens_per_word=1.3).df.collect()
        assert len(rows) > 1
        for r in rows:
            assert r["chunk_tokens"] * 1.3 <= 50 + 1e-9
        # reconstruction still holds (overlap 0): concatenation == doc
        rebuilt = []
        for r in sorted(rows, key=lambda r: r["chunk_id"]):
            rebuilt += r["text"].split()
        assert rebuilt == text.split()

    def test_ratio_validation(self, spark):
        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, "a b c")])
        with pytest.raises(ValueError, match="tokens_per_word"):
            chunk_documents(td, max_tokens=8, tokens_per_word=0)
        with pytest.raises(ValueError, match="rounds to zero"):
            chunk_documents(td, max_tokens=2, tokens_per_word=5.0)

    def test_default_ratio_unchanged(self, spark):
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"x{i}" for i in range(30))
        td = self._mk(spark, [(1, text)])
        a = sorted(
            chunk_documents(td, max_tokens=8, overlap=2).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        b = sorted(
            chunk_documents(td, max_tokens=8, overlap=2, tokens_per_word=1.0).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [(r["text"], r["chunk_tokens"]) for r in a] \
            == [(r["text"], r["chunk_tokens"]) for r in b]

    def test_pack_documents_bpe_column(self, spark):
        """pack_documents over a BPE-estimate column: the budget math
        runs on the provided counts (oracle prefix-sum check), and a
        missing column fails with the actionable message."""
        from datar_polars_spark.scale import pack_documents
        from datar_polars_spark.tibble import ensure_tibble

        rows = [(i, 100 + 37 * (i % 5)) for i in range(40)]
        td = ensure_tibble(
            spark.createDataFrame(rows, "doc_id int, bpe_tokens int")
        )
        out = pack_documents(td, tokens="bpe_tokens", budget=400)
        got = {
            r["doc_id"]: r["pack_id"]
            for r in out.df.select("doc_id", "pack_id").collect()
        }
        acc = 0
        for i, tk in rows:
            assert got[i] == acc // 400, (i, got[i], acc)
            acc += tk
        with pytest.raises(ValueError, match="token-count column"):
            pack_documents(td, tokens="n_tokens", budget=400)


class TestExactTokenBudgets:
    """r10: chunk_documents(token_counts=) bin-packs TRUE per-word
    tokenizer costs — boundaries honor the real budget exactly instead
    of a corpus-average ratio."""

    MAXT, OV = 12, 3

    def _mk(self, spark, docs):
        from datar_polars_spark.tibble import ensure_tibble

        return ensure_tibble(
            spark.createDataFrame(docs, "doc_id long, text string, tc array<int>")
        )

    @staticmethod
    def _oracle(counts, maxt, ov):
        """Reference greedy: e maximal with sum <= budget (>= 1 word);
        next start carries >= ov true tokens unless the budget can't
        admit word e; starts strictly advance."""
        import numpy as np

        n = len(counts)
        if n == 0:
            return [(0, 0, 0)]
        ps = np.concatenate(([0], np.cumsum(np.asarray(counts, "int64"))))
        res, s = [], 0
        while s < n:
            e = int(np.searchsorted(ps, ps[s] + maxt, "right")) - 1
            if e <= s:
                e = s + 1
            res.append((s, e - s, int(ps[e] - ps[s])))
            if e >= n:
                break
            s_ov = int(np.searchsorted(ps, ps[e] - ov, "right")) - 1
            s_min = int(np.searchsorted(ps, ps[e + 1] - maxt, "left"))
            nxt = min(e, max(s_min, s_ov))
            s = nxt if nxt > s else s + 1
        return res

    def test_varying_cost_tokenizer_oracle_parity(self, spark):
        """A tokenizer whose cost VARIES by word (len//2+1): every chunk
        equals the reference greedy's slice, the rewritten token_counts
        stays aligned, budget/coverage/min-overlap invariants hold."""
        import random

        from datar_polars_spark.scale import chunk_documents

        rng = random.Random(3)
        docs = []
        for i in range(20):
            words = ["w" * rng.randint(1, 9) for _ in range(rng.randint(0, 80))]
            docs.append((i, " ".join(words), [len(w) // 2 + 1 for w in words]))
        docs.append((102, "hugeword", [99]))  # single word over budget
        td = self._mk(spark, docs)
        out = chunk_documents(
            td, max_tokens=self.MAXT, overlap=self.OV, token_counts="tc"
        ).df.collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, txt, tc in docs:
            rows = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            words = txt.split()
            want = self._oracle(tc, self.MAXT, self.OV)
            assert len(rows) == len(want)
            covered = set()
            for r, (s, l, nt) in zip(rows, want):
                assert r["text"].split() == words[s : s + l]
                assert list(r["tc"]) == tc[s : s + l]
                assert r["chunk_tokens"] == nt
                assert nt <= self.MAXT or l == 1  # budget (or lone word)
                covered |= set(range(s, s + l))
            assert covered == set(range(len(words)))  # nothing dropped
            for (s1, l1, _), (s2, _, _) in zip(want, want[1:]):
                carried = sum(tc[s2 : s1 + l1])
                budget_limited = (
                    s1 + l1 < len(tc)
                    and sum(tc[s2 : s1 + l1 + 1]) > self.MAXT
                )
                assert carried >= self.OV or budget_limited or s2 == s1 + 1

    def test_uniform_counts_equal_default_path(self, spark):
        """counts == all-ones must reproduce the whitespace-word path
        exactly (same chunks, same token totals)."""
        from datar_polars_spark.scale import chunk_documents

        text = " ".join(f"t{i}" for i in range(100))
        td = self._mk(spark, [(1, text, [1] * 100)])
        key = lambda r: r["chunk_id"]  # noqa: E731
        exact = sorted(
            chunk_documents(
                td, max_tokens=8, overlap=2, token_counts="tc"
            ).df.collect(),
            key=key,
        )
        plain = sorted(
            chunk_documents(td, max_tokens=8, overlap=2).df.collect(), key=key
        )
        assert [(r["text"], r["chunk_tokens"]) for r in exact] == [
            (r["text"], r["chunk_tokens"]) for r in plain
        ]

    def test_null_and_empty_docs(self, spark):
        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, None, None), (2, "  ", [])])
        rows = chunk_documents(
            td, max_tokens=8, token_counts="tc"
        ).df.collect()
        got = {(r["doc_id"], r["chunk_id"], r["text"], r["chunk_tokens"]) for r in rows}
        assert got == {(1, 0, "", 0), (2, 0, "", 0)}

    def test_text_stays_jvm_side(self, spark):
        """Only the counts arrays cross into Python: the plan carries
        one ArrowEvalPython (the bounds UDF), no row-wise Python, no
        shuffle."""
        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, "a bb ccc", [1, 2, 3])])
        out = chunk_documents(td, max_tokens=4, token_counts="tc")
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan

    def test_validation(self, spark):
        import pytest as pt

        from datar_polars_spark.scale import chunk_documents

        td = self._mk(spark, [(1, "a b c", [1, 1])])  # length mismatch
        with pt.raises(Exception, match="word count"):
            chunk_documents(td, max_tokens=8, token_counts="tc").df.collect()
        td2 = self._mk(spark, [(1, "a b", None)])  # NULL counts, words
        with pt.raises(Exception, match="NULL"):
            chunk_documents(td2, max_tokens=8, token_counts="tc").df.collect()
        td3 = self._mk(spark, [(1, "a b", [1, -2])])
        with pt.raises(Exception, match="negative"):
            chunk_documents(td3, max_tokens=8, token_counts="tc").df.collect()
        td4 = self._mk(spark, [(1, "a b", [1, 1])])
        with pt.raises(ValueError, match="mutually"):
            chunk_documents(td4, max_tokens=8, token_counts="tc", tokens_per_word=1.3)
        with pt.raises(ValueError, match="not in the"):
            chunk_documents(td4, max_tokens=8, token_counts="nope")


class TestExactChunkingProperties:
    """Hypothesis property lock on the token_counts bin-packing: for
    ANY cost profile and (budget, overlap) pair, coverage / budget /
    min-overlap / strict-progress invariants hold and the chunks match
    the reference greedy."""

    @staticmethod
    def _run(spark, counts, maxt, ov):
        from datar_polars_spark.scale import chunk_documents
        from datar_polars_spark.tibble import ensure_tibble

        words = [f"w{i}" for i in range(len(counts))]
        td = ensure_tibble(
            spark.createDataFrame(
                [(1, " ".join(words), counts)],
                "doc_id long, text string, tc array<int>",
            )
        )
        rows = sorted(
            chunk_documents(
                td, max_tokens=maxt, overlap=ov, token_counts="tc"
            ).df.collect(),
            key=lambda r: r["chunk_id"],
        )
        return words, rows

    def test_property_fuzz(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        oracle = TestExactTokenBudgets._oracle

        @settings(
            max_examples=25,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(
            counts=st.lists(st.integers(0, 30), min_size=0, max_size=40),
            maxt=st.integers(2, 25),
            ov_frac=st.floats(0, 0.9),
        )
        def check(counts, maxt, ov_frac):
            ov = int(ov_frac * (maxt - 1))
            words, rows = self._run(spark, counts, maxt, ov)
            want = oracle(counts, maxt, ov)
            assert len(rows) == len(want)
            covered = set()
            prev_s = -1
            for r, (s, l, nt) in zip(rows, want):
                assert r["text"].split() == words[s : s + l]
                assert r["chunk_tokens"] == nt
                assert nt <= maxt or l == 1  # budget or lone word
                assert s > prev_s  # strict progress
                prev_s = s
                covered |= set(range(s, s + l))
            assert covered == set(range(len(counts)))  # full coverage

        check()
