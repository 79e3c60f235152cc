"""Corpus-level paragraph dedup (Dolma/FineWeb boilerplate removal):
keep-first by (id, position) across documents, normalized fingerprints,
exempt short/empty paragraphs, NULL-text passthrough, and the plan
shape (two keyed shuffles, no collect)."""

import pytest

from datar_polars_spark import read_parquet
from datar_polars_spark.scale import dedup_paragraphs
from datar_polars_spark.tibble import ensure_tibble

BOILER = "Cookie notice: we use cookies."


@pytest.fixture()
def td(spark):
    docs = [
        (1, f"Unique one.\n\n{BOILER}\n\nTail one.", "en"),
        (2, f"{BOILER}\n\nUnique two.", "en"),
        (3, f"Unique three.\n\n{BOILER}", "de"),
        (4, None, "fr"),
        (5, "", "en"),
        (6, f"  {BOILER.upper()}  \n\nUnique six.", "en"),
        (7, "Unique one.", "en"),
    ]
    return ensure_tibble(
        spark.createDataFrame(docs, "doc_id long, text string, lang string")
    )


def test_keep_first_across_corpus(spark, td):
    out = {r["doc_id"]: r for r in dedup_paragraphs(td).df.collect()}
    # the lowest-id occurrence keeps every paragraph
    assert out[1]["text"] == f"Unique one.\n\n{BOILER}\n\nTail one."
    assert out[1]["paras_removed"] == 0
    # later occurrences lose the boilerplate (normalized: case/space)
    assert out[2]["text"] == "Unique two." and out[2]["paras_removed"] == 1
    assert out[3]["text"] == "Unique three."
    assert out[6]["text"] == "Unique six."  # case-folded duplicate
    # a doc that IS a duplicate paragraph empties out
    assert out[7]["text"] == "" and out[7]["paras_removed"] == 1
    # other columns survive reassembly
    assert out[3]["lang"] == "de"


def test_null_and_empty_docs(spark, td):
    out = {r["doc_id"]: r for r in dedup_paragraphs(td).df.collect()}
    assert out[4]["text"] is None and out[4]["paras_removed"] == 0
    assert out[5]["text"] == "" and out[5]["paras_removed"] == 0


def test_empty_paragraphs_are_exempt(spark):
    docs = [(1, "A\n\n\n\nB"), (2, "C\n\n\n\nD")]
    t = ensure_tibble(spark.createDataFrame(docs, "doc_id long, text string"))
    # the sep regex collapses the blank runs; nothing is removed and
    # no cross-doc collapse of emptiness happens
    out = {r["doc_id"]: r for r in dedup_paragraphs(t).df.collect()}
    assert out[1]["paras_removed"] == 0 and out[2]["paras_removed"] == 0


def test_normalize_off_is_byte_exact(spark, td):
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(td, normalize=False).df.collect()
    }
    assert out[6]["paras_removed"] == 0  # uppercase variant survives
    assert out[2]["paras_removed"] == 1  # byte-identical still dedups


def test_min_chars_exemption(spark):
    docs = [(1, "hi\n\nlong paragraph body"), (2, "hi\n\nother body")]
    t = ensure_tibble(spark.createDataFrame(docs, "doc_id long, text string"))
    out = {
        r["doc_id"]: r
        for r in dedup_paragraphs(t, min_chars=5).df.collect()
    }
    # 'hi' is under min_chars: exempt in BOTH docs
    assert out[2]["text"].startswith("hi")
    assert out[2]["paras_removed"] == 0


def test_within_doc_duplicates_also_collapse(spark):
    t = ensure_tibble(
        spark.createDataFrame(
            [(1, "same para\n\nsame para\n\nother")],
            "doc_id long, text string",
        )
    )
    out = dedup_paragraphs(t).df.first()
    assert out["text"] == "same para\n\nother"
    assert out["paras_removed"] == 1


def test_real_corpus_roundtrip_when_all_unique(spark):
    """On the synthetic docs table (no repeated paragraphs, no
    newlines) the op is an identity up to the count column."""
    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    out = dedup_paragraphs(docs)
    rows = out.df.select("doc_id", "text", "paras_removed").collect()
    orig = {
        r["doc_id"]: r["text"]
        for r in docs.df.select("doc_id", "text").collect()
    }
    for r in rows:
        assert r["text"] == orig[r["doc_id"]]
        assert r["paras_removed"] == 0


def test_validation_and_plan(spark, td):
    with pytest.raises(ValueError, match="reserved"):
        dedup_paragraphs(
            ensure_tibble(td.df.withColumn("__pos", td.df.doc_id))
        )
    with pytest.raises(ValueError, match="count_col"):
        dedup_paragraphs(
            ensure_tibble(td.df.withColumn("paras_removed", td.df.doc_id))
        )
    with pytest.raises(ValueError, match="min_chars"):
        dedup_paragraphs(td, min_chars=-1)
    out = dedup_paragraphs(td)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure JVM
    assert plan.count("Exchange") <= 4  # window + groupBy + join-back


def _exchange_outputs(df):
    """Output column names of every Exchange in the (pre-AQE) physical
    plan — the columns that actually ride each shuffle."""
    p = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in p.getClass().getSimpleName():
        p = p.initialPlan()
    found = []

    def walk(n):
        if "Exchange" in n.getClass().getSimpleName():
            out = n.output()
            found.append([out.apply(i).name() for i in range(out.size())])
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(p)
    return found


def test_corpus_scope_shuffles_are_narrow(spark, td):
    """The r10 plan shipped the FULL document text + payload on every
    exploded paragraph row through both wide exchanges (~Px byte
    amplification). Lock the r11 fix: any exchange carrying the
    exploded paragraph frame holds ONLY (id, pos, para, key[, keep]) —
    the text and payload columns ride at most the single join-back
    exchange."""
    out = dedup_paragraphs(td)
    exchanges = _exchange_outputs(out.df)
    assert exchanges, "expected a physical plan with exchanges"
    # 'min'/'__w' are the keep-first winner aggregation's partial and
    # final columns — a struct<id,pos>, still narrow
    narrow_ok = {"doc_id", "__pos", "__para", "__key", "__keep", "min", "__w"}
    exploded = [
        cols for cols in exchanges
        if any(c.startswith("__p") or c == "__key" for c in cols)
    ]
    assert exploded, "expected the exploded paragraph frame to shuffle"
    for cols in exploded:
        assert set(cols) <= narrow_ok, f"wide exploded shuffle: {cols}"
    # text/payload may ride only the join-back exchange (once)
    wide = [cols for cols in exchanges if "text" in cols or "lang" in cols]
    assert len(wide) <= 1, f"payload rides {len(wide)} exchanges: {wide}"


def test_randomized_differential_vs_python_reference(spark):
    """Random corpora drawn from a SMALL paragraph alphabet (forcing
    heavy cross-doc collisions) must match a straightforward Python
    keep-first reference, doc by doc."""
    import random

    rng = random.Random(17)
    alphabet = [f"para {i} body text" for i in range(12)] + ["", "  "]
    docs = []
    for i in range(60):
        paras = [alphabet[rng.randrange(len(alphabet))]
                 for _ in range(rng.randrange(0, 6))]
        docs.append((i, "\n\n".join(paras) if paras else ""))
    t = ensure_tibble(spark.createDataFrame(docs, "doc_id long, text string"))
    got = {
        r["doc_id"]: (r["text"], r["paras_removed"])
        for r in dedup_paragraphs(t).df.collect()
    }

    # python reference: same rules (split '\n\n+', lower+trim
    # fingerprint, trimmed-empty exempt, keep-first by (id, pos))
    import re

    seen = set()
    want = {}
    for i, text in docs:
        paras = re.split(r"\n\n+", text if text is not None else "")
        kept, removed = [], 0
        for p in paras:
            fp = p.strip().lower()
            if len(p.strip()) < 1:
                kept.append(p)
            elif fp not in seen:
                seen.add(fp)
                kept.append(p)
            else:
                removed += 1
        want[i] = ("\n\n".join(kept), removed)
    assert got == want


class TestDocumentScope:
    """scope='document' (Dolma's within-doc mode): pure array
    expressions, zero shuffles, no cross-document coupling."""

    def test_within_doc_only(self, spark):
        docs = [
            (1, "same\n\nsame\n\nother"),
            (2, "same\n\nunique two"),  # 'same' survives: other doc
            (3, None),
            (4, ""),
        ]
        t = ensure_tibble(
            spark.createDataFrame(docs, "doc_id long, text string")
        )
        out = {
            r["doc_id"]: r
            for r in dedup_paragraphs(t, scope="document").df.collect()
        }
        assert out[1]["text"] == "same\n\nother"
        assert out[1]["paras_removed"] == 1
        assert out[2]["text"] == "same\n\nunique two"  # NOT removed
        assert out[2]["paras_removed"] == 0
        assert out[3]["text"] is None and out[3]["paras_removed"] == 0
        assert out[4]["text"] == "" and out[4]["paras_removed"] == 0

    def test_agrees_with_corpus_scope_on_one_doc(self, spark):
        text = "a\n\nb\n\nA \n\nc\n\nb"
        t = ensure_tibble(
            spark.createDataFrame([(1, text)], "doc_id long, text string")
        )
        doc = dedup_paragraphs(t, scope="document").df.first()
        cor = dedup_paragraphs(t, scope="corpus").df.first()
        assert doc["text"] == cor["text"] == "a\n\nb\n\nc"
        assert doc["paras_removed"] == cor["paras_removed"] == 2

    def test_normalize_and_min_chars(self, spark):
        t = ensure_tibble(
            spark.createDataFrame(
                [(1, "Hi\n\nhi\n\nHELLO WORLD\n\nhello world")],
                "doc_id long, text string",
            )
        )
        out = dedup_paragraphs(
            t, scope="document", min_chars=5
        ).df.first()
        # 'Hi'/'hi' under min_chars: both exempt; the long dup collapses
        assert out["text"] == "Hi\n\nhi\n\nHELLO WORLD"
        byte = dedup_paragraphs(
            t, scope="document", min_chars=5, normalize=False
        ).df.first()
        assert byte["paras_removed"] == 0  # case differs byte-wise

    def test_zero_shuffle_plan(self, spark):
        t = ensure_tibble(
            spark.createDataFrame(
                [(1, "a\n\nb")], "doc_id long, text string"
            )
        )
        out = dedup_paragraphs(t, scope="document")
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow: runs inside the scan
        assert "Python" not in plan

    def test_validation(self, spark):
        t = ensure_tibble(
            spark.createDataFrame([(1, "a")], "doc_id long, text string")
        )
        with pytest.raises(ValueError, match="scope"):
            dedup_paragraphs(t, scope="nope")
