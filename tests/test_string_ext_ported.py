"""Ported from reference tests/base/test_string_ext.py (chartr, grep,
grepl, gsub, strsplit, strtoi, sub, substr/substring, sprintf, trimws,
startswith, endswith). Column cases run mutate-form (our API is
column-deferred); list/scalar cases exercise the eager ``grep`` helper.
"""

from datar_polars_spark import f, tibble, mutate
from datar_polars_spark.functions import (
    chartr,
    endswith,
    grep,
    grepl,
    gsub,
    sprintf,
    startswith,
    strsplit,
    strtoi,
    sub,
    substr,
    substring,
    trimws,

    toupper,
    tolower,
    nchar,
    nzchar,
    paste,
    paste0,
)


def _col(spark, data, expr):
    return (tibble(spark, x=data) >> mutate(y=expr)).collect()["y"].tolist()


class TestChartr:
    def test_chartr_in_mutate(self, spark):
        got = _col(spark, ["abc", "bac", "cab"], chartr("ab", "xy", f.x))
        assert got == ["xyc", "yxc", "cxy"]


class TestGrep:
    def test_grep_basic(self):
        assert grep("he", ["hello", "world", "help", "nope"]) == [0, 2]

    def test_grep_regex(self):
        assert grep(".", ["ab", "c.d"]) == [0, 1]

    def test_grep_regex_fixed(self):
        assert grep(".", ["ab", "c.d"], fixed=True) == [1]

    def test_grep_invert(self):
        assert grep("he", ["hello", "world", "help", "nope"], invert=True) == [1, 3]

    def test_grep_ignore_case(self):
        assert grep("HE", ["hello", "world", "HELP"], ignore_case=True) == [0, 2]

    def test_grep_fixed(self):
        assert grep(".", ["a.b", "axb", "ab"], fixed=True) == [0]

    def test_grep_scalar(self):
        assert grep("he", "hello") == [0]
        assert grep("he", "world") == []

    def test_grep_value(self):
        assert grep("he", ["hello", "world", "help"], value=True) == [
            "hello",
            "help",
        ]


class TestGrepl:
    def test_grepl_in_mutate(self, spark):
        got = _col(spark, ["hello", "world", "help"], grepl("he", f.x))
        assert got == [True, False, True]

    def test_grepl_ignore_case(self, spark):
        got = _col(
            spark, ["Hello", "WORLD", "help"], grepl("he", f.x, ignore_case=True)
        )
        assert got == [True, False, True]


class TestGsub:
    def test_gsub_in_mutate(self, spark):
        got = _col(spark, ["abac", "abcabc", "xyz"], gsub("a", "X", f.x))
        assert got == ["XbXc", "XbcXbc", "xyz"]

    def test_gsub_regex(self, spark):
        got = _col(spark, ["ab", "c.d.e"], gsub(".", "x", f.x))
        assert got == ["xx", "xxxxx"]

    def test_gsub_fixed(self, spark):
        got = _col(spark, ["a.b"], gsub(".", "X", f.x, fixed=True))
        assert got == ["aXb"]
        got = _col(spark, ["ab", "c.d.e"], gsub(".", "x", f.x, fixed=True))
        assert got == ["ab", "cxdxe"]

    def test_gsub_replace_with_ref(self, spark):
        # reference uses \1-style backrefs in the replacement
        got = _col(spark, ["abcd"], gsub(r"(\w)(\w)", r"\2\1", f.x))
        assert got == ["badc"]
        got = _col(spark, ["a1", "b2"], gsub(r"(\w)(\d)", r"\2\1", f.x))
        assert got == ["1a", "2b"]

    def test_gsub_dollar_literal(self, spark):
        got = _col(spark, ["price"], gsub("pri", "$", f.x))
        assert got == ["$ce"]


class TestStrsplit:
    def test_strsplit_in_mutate(self, spark):
        got = _col(spark, ["a,b,c", "d,e"], strsplit(f.x, ","))
        assert [list(v) for v in got] == [["a", "b", "c"], ["d", "e"]]


class TestStrtoi:
    def test_strtoi_in_mutate(self, spark):
        got = _col(spark, ["10", "20", "30"], strtoi(f.x))
        assert got == [10, 20, 30]

    def test_strtoi_base(self, spark):
        got = _col(spark, ["ff"], strtoi(f.x, base=16))
        assert got == [255]


class TestSub:
    def test_sub_in_mutate(self, spark):
        got = _col(spark, ["abac", "abcabc", "xyz"], sub("a", "X", f.x))
        assert got == ["Xbac", "Xbcabc", "xyz"]

    def test_sub_regex(self, spark):
        got = _col(spark, ["ab", "c.d.e"], sub(".", "x", f.x))
        assert got == ["xb", "x.d.e"]

    def test_sub_fixed(self, spark):
        got = _col(spark, ["ab", "c.d.e"], sub(".", "x", f.x, fixed=True))
        assert got == ["ab", "cxd.e"]

    def test_sub_replace_with_ref(self, spark):
        got = _col(spark, ["abcd"], sub(r"(\w)(\w)", r"\2\1", f.x))
        assert got == ["bacd"]


class TestSubstr:
    def test_substr_in_mutate(self, spark):
        # 0-indexed start, exclusive stop (reference string.py:497)
        got = _col(spark, ["abcdef", "ghijkl"], substr(f.x, 1, 3))
        assert got == ["bc", "hi"]


class TestSubstring:
    def test_substring_in_mutate(self, spark):
        got = _col(spark, ["abcdef", "ghijkl"], substring(f.x, 1, 4))
        assert got == ["bcd", "hij"]


class TestSprintf:
    def test_sprintf_in_mutate(self, spark):
        got = _col(spark, ["Alice", "Bob"], sprintf("Hello %s", f.x))
        assert got == ["Hello Alice", "Hello Bob"]

    def test_sprintf_two_args(self, spark):
        td = tibble(spark, name=["Alice", "Bob"], score=[95, 87])
        got = (td >> mutate(y=sprintf("%s: %d", f.name, f.score))).collect()
        assert got["y"].tolist() == ["Alice: 95", "Bob: 87"]


class TestTrimws:
    def test_trimws_in_mutate(self, spark):
        got = _col(spark, ["  hello  ", "\t test\t", "abc"], trimws(f.x))
        assert got == ["hello", "test", "abc"]

    def test_trimws_left(self, spark):
        got = _col(spark, ["  hello  "], trimws(f.x, which="left"))
        assert got == ["hello  "]

    def test_trimws_right(self, spark):
        got = _col(spark, ["  hello  "], trimws(f.x, which="right"))
        assert got == ["  hello"]


class TestStartsEndsWith:
    def test_startswith_in_mutate(self, spark):
        got = _col(spark, ["hello", "world", "help"], startswith(f.x, "he"))
        assert got == [True, False, True]

    def test_endswith_in_mutate(self, spark):
        got = _col(spark, ["hello", "world", "held"], endswith(f.x, "ld"))
        assert got == [False, True, True]


# -- scalar / list dispatch (reference *_scalar forms; exercises
# functions/eager.py rather than the column compilers) ----------------------

class TestStringScalarDispatch:
    def test_grepl_scalar(self):
        assert grepl("an", "banana") is True
        assert grepl("zz", "banana") is False

    def test_grepl_ignore_case(self):
        assert grepl("AN", "banana", ignore_case=True) is True

    def test_grepl_fixed(self):
        assert grepl(".", "a.b", fixed=True) is True
        assert grepl("x", "ab", fixed=True) is False

    def test_gsub_scalar(self):
        assert gsub("a", "o", "banana") == "bonono"

    def test_gsub_fixed(self):
        assert gsub(".", "-", "a.b.c", fixed=True) == "a-b-c"

    def test_gsub_replace_with_ref(self):
        assert gsub(r"(\w+)@", r"\1 at ", "joe@x") == "joe at x"

    def test_sub_scalar_first_only(self):
        assert sub("a", "o", "banana") == "bonana"

    def test_chartr_scalar(self):
        assert chartr("ab", "xy", "aabb") == "xxyy"

    def test_sprintf_scalar(self):
        assert sprintf("%d-%s", 3, "x") == "3-x"

    def test_sprintf_vectorized(self):
        assert sprintf("%d", [1, 2]) == ["1", "2"]

    def test_toupper_tolower_scalar(self):
        assert toupper("ab") == "AB"
        assert tolower("AB") == "ab"

    def test_nchar_nzchar_scalar(self):
        assert nchar("abc") == 3
        assert nzchar("") is False
        assert nzchar("x") is True

    def test_trimws_scalar(self):
        assert trimws("  x ") == "x"

    def test_strtoi_scalar(self):
        assert strtoi("ff", 16) == 255
        assert strtoi("10", 2) == 2

    def test_substr_scalar_reference_slice(self):
        # reference semantics: 0-indexed start, exclusive stop
        assert substr("hello", 1, 3) == "el"

    def test_strsplit_scalar(self):
        assert strsplit("a,b", ",") == ["a", "b"]

    def test_startswith_endswith_scalar(self):
        assert startswith("abc", "a") is True
        assert endswith("abc", "c") is True

    def test_paste_scalar_and_collapse(self):
        assert paste("a", "b") == "a b"
        assert paste0("a", "b") == "ab"
        assert paste0(["x", "y"], collapse="-") == "x-y"

    def test_list_forms_propagate_none(self):
        out = toupper(["a", None])
        assert out == ["A", None]
