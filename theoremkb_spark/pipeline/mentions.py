"""Stage 3 — MENTIONS: labeled tokens -> span texts -> mined references.

Re-expresses the reference's per-document state machine
(``extract_results``: Styling/tools/theoremdb/extract_graph.py:133-229)
declaratively:

* link-marker transforms are per-token JVM expressions
  (cite anchor -> ``<LINK:anchor>``; goto-linked numbers -> ``#in``);
* span text assembly is an ordered aggregation
  (``array_sort(collect_list(struct(ordinals, text)))`` + ``concat_ws``) —
  no Python, no second shuffle beyond the groupBy;
* normalization (de-hyphenate + NFKD — no NFKD in Spark SQL) and
  reference mining (``find_ref_results``, extract_graph.py:44-130 — too
  stateful for SQL regex alone) are vectorized pandas UDFs over the
  span table, which is ~2 orders of magnitude smaller than the token
  table (one row per result span).

The last-theorem fallback for anonymous proofs
(extract_graph.py:247-254) is a forward-fill window with a reset
sentinel: an unnamed statement resets lastThm to null exactly as the
reference does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (?i) prefixes keep the JVM regexes interchangeable with their frozen
# Python twins (RE_THM_START / RE_PROOF_BRACKET / RE_RESULT_NAME in
# functions/text.py all carry re.IGNORECASE).
NUM_RE = r"(([a-z]\.)?\d+(\.\d+)*)"
THM_START_RE = r"(?i)^((open )?(\w+) ([a-z]\.)?\d+(\.\d+)*)"
PROOF_BRACKET_RE = r"(?i)Proof. \[([^\]]+)\]"
RESULT_NAME_RE = r"(?i)((\w+) ([a-z]\.)?\d+(\.\d+)*)"
PROOF_OF_RE = r"(?i)Proof of ((\w+) ([a-z]\.)?\d+(\.\d+)*)"

_RESET = "\x00"  # lastThm reset sentinel (unnamed statement)


@F.pandas_udf(T.StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    """Frozen normalize (extract_graph.py:21-23): de-hyphenate + NFKD."""
    from ..functions.text import normalize_text

    return s.map(normalize_text)


REFS_SCHEMA = T.StructType(
    [
        T.StructField("intras", T.ArrayType(T.StringType()), False),
        T.StructField(
            "extras",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), False),
                        T.StructField("name", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


@F.pandas_udf(REFS_SCHEMA)
def refs_udf(own: pd.Series, text: pd.Series) -> pd.DataFrame:
    """Vectorized find_ref_results over span texts."""
    from ..functions.text import find_ref_results

    intras, extras = [], []
    for o, t in zip(own, text):
        _, intra, extra = find_ref_results(o, t or "")
        intras.append(sorted(set(intra)))
        extras.append(sorted({(tag, name) for tag, name in extra}))
    return pd.DataFrame(
        {
            "intras": intras,
            "extras": [[{"tag": a, "name": b} for a, b in e] for e in extras],
        }
    )


def assemble_spans(labeled: DataFrame) -> DataFrame:
    """labeled tokens -> spans(url, group, label, text, start/end ordinals).

    The marker transform happens before aggregation so the aggregation
    itself is a plain ordered string concat.
    """
    marked = F.when(
        F.col("link") == "cite", F.concat(F.lit("<LINK:"), F.col("text"), F.lit(">"))
    ).when(
        F.col("link") == "in", F.regexp_replace(F.col("text"), NUM_RE, "$1#in")
    ).otherwise(F.col("text"))

    spans = (
        labeled.filter(F.col("label") != "O")
        .withColumn("_marked", marked)
        .groupBy("url", "group", "label")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("page", "block", "line", "word", F.col("_marked").alias("t"))
                        )
                    ),
                    lambda x: x["t"],
                ),
            ).alias("raw_text"),
            F.min(F.struct("page", "block", "line", "word")).alias("start"),
            F.max(F.struct("page", "block", "line", "word")).alias("end"),
        )
        .withColumn("text", normalize_udf(F.col("raw_text")))
        .drop("raw_text")
    )
    return spans


def resolve_span_names(spans: DataFrame) -> DataFrame:
    """Attach each span's own result name.

    Statements: head-anchored find_thm_start (extract_graph.py:26-31).
    Proofs: bracketed or "Proof of X" explicit target (find_thm_proof,
    extract_graph.py:34-41), else forward-filled last statement name.
    """
    thm_raw = F.regexp_extract(F.col("text"), THM_START_RE, 1)
    thm = F.when(thm_raw != "", thm_raw)  # null when unnamed

    bracket = F.regexp_extract(F.col("text"), PROOF_BRACKET_RE, 1)
    bracket_name = F.regexp_extract(bracket, RESULT_NAME_RE, 1)
    proof_of = F.regexp_extract(F.col("text"), PROOF_OF_RE, 1)
    explicit = F.when(bracket_name != "", bracket_name).when(proof_of != "", proof_of)

    is_proof = F.col("label") == "proof"
    named = spans.withColumn("_thm", F.when(~is_proof, thm)).withColumn(
        "_explicit", F.when(is_proof, explicit)
    )

    w = (
        Window.partitionBy("url")
        .orderBy("group")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # unnamed statements RESET lastThm to null (reference behaviour:
    # extract_links keeps lastThm = None after an unnamed span)
    last_candidate = F.when(~is_proof, F.coalesce(F.col("_thm"), F.lit(_RESET)))
    filled = F.last(last_candidate, ignorenulls=True).over(w)
    last_thm = F.when(filled != _RESET, filled)

    own = F.when(is_proof, F.coalesce(F.col("_explicit"), last_thm)).otherwise(
        F.col("_thm")
    )
    return named.withColumn("own_name", F.lower(own)).drop("_thm", "_explicit")


def mine_mentions(spans_named: DataFrame) -> DataFrame:
    """spans -> exploded mention rows.

    Output: (url, group, label, own_name, kind, ref_name, ref_tag)
    kind in {intra, extra}; extra rows carry the citation tag.
    """
    with_refs = spans_named.withColumn(
        "_refs", refs_udf(F.col("own_name"), F.col("text"))
    )
    # one UDF evaluation + ONE explode: intra and extra mentions are
    # merged into a single array of (kind, tag, name) structs first
    merged = F.concat(
        F.transform(
            F.col("_refs.intras"),
            lambda x: F.struct(
                F.lit("intra").alias("kind"),
                F.lit(None).cast("string").alias("tag"),
                x.alias("name"),
            ),
        ),
        F.transform(
            F.col("_refs.extras"),
            lambda e: F.struct(
                F.lit("extra").alias("kind"),
                e["tag"].alias("tag"),
                e["name"].alias("name"),
            ),
        ),
    )
    return with_refs.select(
        "url",
        "group",
        "label",
        "own_name",
        F.explode(merged).alias("_m"),
    ).select(
        "url",
        "group",
        "label",
        "own_name",
        F.lower(F.col("_m.name")).alias("ref_name"),
        F.col("_m.kind").alias("kind"),
        F.col("_m.tag").alias("ref_tag"),
    )


def paper_citations(tokens: DataFrame) -> DataFrame:
    """Doc-wide citation anchors -> (url, tag). Pure JVM filter+project —
    pushed down to the token scan."""
    return (
        tokens.filter(F.col("link") == "cite")
        .select("url", F.regexp_replace(F.col("text"), r"\W", "").alias("tag"))
        .distinct()
    )
