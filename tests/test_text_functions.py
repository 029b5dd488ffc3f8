"""Table-driven tests for the frozen text semantics (SURVEY §5.2.4).

Edge cases mirror the reference mention-mining behaviour
(extract_graph.py:26-130): conjunction lists, abbreviations,
self-reference suppression, #in markers, link windows.
"""

from theoremkb_spark.functions.text import (
    find_ref_results,
    find_thm_proof,
    find_thm_start,
    get_pattern,
    norm_title,
    normalize_text,
)


def test_get_pattern():
    assert get_pattern("Bonjour") == "bonjour"
    assert get_pattern("Page 10/52") == "page @@@@"
    assert get_pattern("Theorem") == "theorem"
    assert get_pattern("Proof.") == "proof"
    assert get_pattern("[EXT3]") == "ext@"


def test_normalize_text():
    assert normalize_text("effi- cient") == "efficient"
    assert normalize_text("eﬃcient") == "efficient"  # ﬃ ligature NFKD
    assert normalize_text("plain words") == "plain words"


def test_norm_title():
    assert norm_title("On The Abound Problem!") == "ontheaboundproblem"


def test_find_thm_start():
    assert find_thm_start("Theorem 3.1. It holds") == "Theorem 3.1"
    assert find_thm_start("Open Problem 4 states") == "Open Problem 4"
    assert find_thm_start("Lemma a.2.4 shows") == "Lemma a.2.4"
    assert find_thm_start("Remark. unnumbered") is None
    assert find_thm_start("we discuss Theorem 3") is None  # head-anchored


def test_find_thm_proof():
    assert find_thm_proof("Proof. [Proof of Theorem 5.2]") == "Theorem 5.2"
    assert find_thm_proof("Proof of Theorem 5.2. We begin") == "Theorem 5.2"
    assert find_thm_proof("Proof. We begin directly") is None


def test_refs_simple():
    _, intra, extra = find_ref_results("Theorem 9.9", "by Theorem 3.1 we conclude")
    assert intra == ["theorem 3.1"]
    assert extra == []


def test_refs_self_suppressed():
    _, intra, extra = find_ref_results(
        "Theorem 3.1", "Theorem 3.1 follows from Lemma 2.2"
    )
    assert intra == ["lemma 2.2"]


def test_refs_conjunction():
    _, intra, _ = find_ref_results(None, "using Theorems 1.1 and 1.2 we see")
    assert sorted(intra) == ["theorem 1.1", "theorem 1.2"]
    _, intra2, _ = find_ref_results(None, "Lemmas 2.1, 2.2 & 2.3 imply")
    assert sorted(intra2) == ["lemma 2.1", "lemma 2.2", "lemma 2.3"]


def test_refs_abbreviation():
    _, intra, _ = find_ref_results(None, "see thm. 4.1 for details")
    assert intra == ["theorem 4.1"]
    _, intra2, _ = find_ref_results(None, "by prop. 2.3 and lem. 1.1")
    assert "proposition 2.3" in intra2 and "lemma 1.1" in intra2


def test_refs_in_marker_is_intra():
    _, intra, extra = find_ref_results(None, "by Theorem 1.2#in we conclude")
    assert intra == ["theorem 1.2"]
    assert extra == []


def test_refs_link_window_extra():
    _, intra, extra = find_ref_results(
        None, "Theorem 2.1 of <LINK:[EXT7]> settles this"
    )
    assert intra == []
    assert extra == [("EXT7", "theorem 2.1")]


def test_refs_link_window_too_far():
    # anchor beyond the +/-5-word window -> intra fallback
    _, intra, extra = find_ref_results(
        None, "Theorem 2.1 a b c d e f <LINK:[EXT7]> far away"
    )
    assert intra == ["theorem 2.1"]
    assert extra == []


def test_refs_link_to_result_anchor_is_intra():
    # anchor that itself names a result -> intra, not extra
    _, intra, extra = find_ref_results(None, "Theorem 2.1 <LINK:theorem2.1> here")
    assert intra == ["theorem 2.1"]
    assert extra == []


def test_refs_duplicate_visited_once():
    _, intra, _ = find_ref_results(None, "Theorem 3.1 holds; also Theorem 3.1 again")
    assert intra == ["theorem 3.1"]


class TestCleanThm:
    """F8 — the reference's theorem-text cleaner, frozen from
    thm_similarity/thmtools.py:64-70."""

    CASES = [
        ("Theorem 3.1", "theorem 3 1 "),
        (r"let \begin{equation}x^2\end{equation} hold", None),  # parity-pinned below
        ("A+B=C", "a + b = c"),
        ("", ""),
        ("MiXeD CaSe 42", "mixed case 42 "),
        (r"see \cite{foo, bar} for details", None),
        ("x_i^2 * y", "x _ i ^ 2 * y"),
    ]

    def test_table_driven(self):
        from theoremkb_spark.functions.text import clean_thm

        # structural invariants on every case
        for raw, _ in self.CASES:
            out = clean_thm(raw)
            assert out == out.lower()
            assert "\\cite" not in out and "\\begin" not in out
        # pinned exact values where stated
        for raw, want in self.CASES:
            if want is not None:
                assert clean_thm(raw) == want, (raw, clean_thm(raw))

    def test_reference_parity(self):
        """Exec the reference's own clean_thm and diff byte-for-byte."""
        import re as _re

        src = open("/root/reference/Styling/tools/thm_similarity/thmtools.py").read()
        cut = src.index("# Clean a theorem")
        end = src.index("# Get references", cut)
        ns = {"re": _re, "str": str}
        exec(compile(src[cut:end].replace("\t", "    "), "ref/thmtools.py", "exec"), ns)
        from theoremkb_spark.functions.text import clean_thm

        samples = [raw for raw, _ in self.CASES] + [
            r"\label{thm:main} If $x>0$ then \ref{lem2} applies",
            "Lemmas 2.1, 2.2 & 2.3 imply x<=y",
        ]
        for s in samples:
            assert clean_thm(s) == ns["clean_thm"](s), s

    def test_jvm_twin_identical(self, spark):
        from pyspark.sql import functions as F

        from theoremkb_spark.functions.text import clean_thm
        from theoremkb_spark.operators.textquality import clean_thm_col

        samples = [raw for raw, _ in self.CASES] + [
            r"\footnotesize{note, x} trailing",
            "digits42inside and under_score",
        ]
        df = spark.createDataFrame([(s,) for s in samples], "text string")
        got = [r.c for r in df.select(clean_thm_col(F.col("text")).alias("c")).collect()]
        assert got == [clean_thm(s) for s in samples]

    def test_duckdb_twin_identical(self):
        import duckdb

        from theoremkb_spark.functions.text import clean_thm
        from theoremkb_spark.queries_docs import _CLEAN_THM_SQL

        samples = [raw for raw, _ in self.CASES] + ["Proof of Theorem 5.2."]
        con = duckdb.connect()
        for s in samples:
            got = con.execute(
                f"SELECT {_CLEAN_THM_SQL} FROM (SELECT ? AS text)", [s]
            ).fetchone()[0]
            assert got == clean_thm(s), s


def test_sql_udf_registration(spark):
    """The SQL surface returns exactly what the Python functions return,
    null-safe, via spark.sql."""
    from theoremkb_spark.functions.sql import register_sql_functions
    from theoremkb_spark.functions.text import get_pattern, normalize_text

    names = register_sql_functions(spark)
    assert "tkb_get_pattern" in names
    df = spark.createDataFrame(
        [("Theorem 4.1",), ("hy- phenated text",), (None,)], "s string"
    )
    df.createOrReplaceTempView("sqludf_probe")
    rows = spark.sql(
        "SELECT tkb_get_pattern(s) AS p, tkb_normalize_text(s) AS n "
        "FROM sqludf_probe"
    ).collect()
    assert rows[0].p == get_pattern("Theorem 4.1")
    assert rows[1].n == normalize_text("hy- phenated text")
    assert rows[2].p is None and rows[2].n is None
