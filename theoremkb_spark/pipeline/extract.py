"""Stage 1 — EXTRACT: html -> token stream + extracted text.

Replaces the reference's pdfalto subprocess + lxml scan
(``Styling/src/lib/paper/__init__.py:230-244``, ``paper/features.py:43-79``)
with a deterministic Arrow-batched ``mapInPandas`` parser over the
``html:binary`` column. No shelling out, no per-row Python UDFs — one
Python invocation per Arrow batch, heavy work amortized per document.

Per-row invariant (BASELINE.json input_hint): the extracted text is
byte-identical to the reference extraction semantics per url
(``get_text``: words joined by spaces within a line, '\\n' per line —
``Styling/src/lib/misc/__init__.py:9-25``). ``extract_text`` exists to
prove that invariant; the pipeline itself consumes ``extract_tokens``.

Scale notes: the parse is a narrow map — no shuffle. Input is
repartitioned by xxhash64(url) upstream (north rule) so document skew
spreads across tasks; Arrow batch size is capped in session.py so one
giant document cannot blow a batch.
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("block", T.IntegerType(), False),
        T.StructField("line", T.IntegerType(), False),
        T.StructField("word", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("hpos", T.DoubleType(), True),
        T.StructField("vpos", T.DoubleType(), True),
        T.StructField("width", T.DoubleType(), True),
        T.StructField("height", T.DoubleType(), True),
        T.StructField("font_id", T.StringType(), True),
        T.StructField("italic", T.BooleanType(), True),
        T.StructField("math", T.BooleanType(), True),
        T.StructField("bold", T.BooleanType(), True),
        T.StructField("font_size", T.DoubleType(), True),
        T.StructField("link", T.StringType(), True),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

RE_FONT = re.compile(r'<meta name="font" id="(.*?)" family="(.*?)" size="(.*?)"/>')
RE_PAGE = re.compile(r'<section class="page" n="(\d+)">(.*?)</section>', re.S)
RE_BLOCK = re.compile(r'<div class="block" n="(\d+)">(.*?)</div>', re.S)
RE_LINE = re.compile(r'<p class="line">(.*?)</p>', re.S)
RE_WORD = re.compile(
    r'<w f="(.*?)" x="(.*?)" y="(.*?)" w="(.*?)" h="(.*?)"(?: l="(.*?)")?>(.*?)</w>'
)

# Font-class regexes frozen from the reference
# (Styling/src/lib/features/String.py:25-30).
RE_ITALIC = re.compile(r"((TI)[0-9]+|Ital|rsfs|EUSM)", re.IGNORECASE)
RE_BOLD = re.compile(r"(CMBX|Bold|NimbusRomNo9L-Medi)", re.IGNORECASE)
RE_MATH = re.compile(
    r"((CM)(SY|MI|EX)|math|Math|MSAM|MSBM|LASY|cmex|StandardSymL)", re.IGNORECASE
)


def _parse_fonts(page: str) -> dict[str, tuple[bool, bool, bool, float]]:
    fonts = {}
    for fid, family, size in RE_FONT.findall(page):
        fonts[fid] = (
            RE_ITALIC.search(family) is not None,
            RE_MATH.search(family) is not None,
            RE_BOLD.search(family) is not None,
            float(size),
        )
    return fonts


def _parse_tokens(url: str, html: bytes) -> list[tuple]:
    """One document -> token rows. Malformed rows yield no tokens rather
    than failing the job (recover-parse posture, ref: tools/ml/
    features.py:214-216)."""
    try:
        s = html.decode("utf-8")
    except Exception:
        return []
    fonts = _parse_fonts(s)
    rows = []
    for page_n, page_body in RE_PAGE.findall(s):
        p = int(page_n)
        for block_n, block_body in RE_BLOCK.findall(page_body):
            b = int(block_n)
            for li, line_body in enumerate(RE_LINE.findall(block_body)):
                for wi, m in enumerate(RE_WORD.finditer(line_body)):
                    fid, x, y, w, h, link, content = m.groups()
                    italic, math, bold, size = fonts.get(fid, (None, None, None, None))
                    rows.append(
                        (
                            url,
                            p,
                            b,
                            li,
                            wi,
                            _html.unescape(content),
                            float(x),
                            float(y),
                            float(w),
                            float(h),
                            fid,
                            italic,
                            math,
                            bold,
                            size,
                            link if link else None,
                        )
                    )
    return rows


def extract_tokens(pages: DataFrame, english_only: bool = True) -> DataFrame:
    """pages(url, html, ...) -> long token DataFrame (FIXTURES.md §2)."""
    if english_only:
        pages = pages.filter(F.col("lang") == "en")
    src = pages.select("url", "html")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TOKEN_SCHEMA.fields]
        for pdf in batches:
            out = []
            for url, html in zip(pdf["url"], pdf["html"]):
                if html is None:
                    continue  # null payload -> no tokens, not a job failure
                out.extend(_parse_tokens(url, bytes(html)))
            yield pd.DataFrame(out, columns=cols)

    return src.mapInPandas(parse, schema=TOKEN_SCHEMA)


def extract_text(pages: DataFrame, english_only: bool = False) -> DataFrame:
    """pages -> (url, text) under the frozen get_text rule — the
    byte-identical invariant surface."""
    if english_only:
        pages = pages.filter(F.col("lang") == "en")
    src = pages.select("url", "html")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, texts = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                toks = _parse_tokens(url, bytes(html)) if html is not None else []
                parts: list[str] = []
                cur_line = None
                words: list[str] = []
                for t in toks:
                    key = (t[1], t[2], t[3])
                    if cur_line is not None and key != cur_line:
                        parts.append(" ".join(words))
                        parts.append("\n")
                        words = []
                    cur_line = key
                    words.append(t[5])
                if cur_line is not None:
                    parts.append(" ".join(words))
                    parts.append("\n")
                urls.append(url)
                texts.append("".join(parts))
            yield pd.DataFrame({"url": urls, "text": texts})

    return src.mapInPandas(parse, schema="url string, text string")


def load_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Materialize the synthetic pages corpus as a DataFrame (test scale)."""
    from ..corpus.generator import pages_rows

    rows = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
        for r in pages_rows(n_docs, seed)
    ]
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def write_pages_parquet(path: str, n_docs: int, seed: int = 42, chunk: int = 200) -> None:
    """Write the synthetic corpus to parquet without Spark (pyarrow),
    chunked so large corpora never sit in memory at once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..corpus.generator import pages_rows

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    writer = pq.ParquetWriter(path, schema)
    buf: list[dict] = []

    def flush():
        nonlocal buf
        if buf:
            writer.write_table(pa.Table.from_pylist(buf, schema=schema))
            buf = []

    for r in pages_rows(n_docs, seed):
        buf.append(r)
        if len(buf) >= chunk:
            flush()
    flush()
    writer.close()
