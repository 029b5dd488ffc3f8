"""Structured-Streaming incremental ingest: files landing in two waves
must produce exactly the full-corpus triple set — no loss, no dupes —
and a second drain with nothing new must commit nothing."""

import pyarrow as pa
import pyarrow.parquet as pq

from theoremkb_spark.corpus.generator import build_corpus, entity_dict_rows, pages_rows
from theoremkb_spark.corpus.oracle import oracle_triples
from theoremkb_spark.io.catalog import CheckpointedTripleStore
from theoremkb_spark.pipeline.runner import load_dico
from theoremkb_spark.streaming.ingest import stream_pages_to_store

N = 24

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _write_wave(path, rows):
    pq.write_table(pa.Table.from_pylist(rows, schema=_SCHEMA), path)


def test_streaming_two_waves_match_oracle(spark, tmp_path):
    rows = list(pages_rows(N))
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    store = CheckpointedTripleStore(str(tmp_path / "kg"))
    dico = load_dico(spark, entity_dict_rows(N)).cache()

    # wave 1: first half of the corpus lands
    _write_wave(str(pages_dir / "wave1.parquet"), rows[: N // 2])
    n1 = stream_pages_to_store(spark, str(pages_dir), store, dico)
    assert n1 >= 1
    half = store.read_triples(spark).count()

    # wave 2: the rest lands; the stream checkpoint skips wave1 files
    _write_wave(str(pages_dir / "wave2.parquet"), rows[N // 2 :])
    n2 = stream_pages_to_store(spark, str(pages_dir), store, dico)
    assert n2 >= 1

    got = {
        (r.subj, r.pred, r.obj, r.url) for r in store.read_triples(spark).collect()
    }
    exp = oracle_triples(list(build_corpus(N)), entity_dict_rows(N))
    assert got == exp
    df = store.read_triples(spark)
    assert df.count() == df.dropDuplicates(["subj", "pred", "obj", "url"]).count()
    assert df.count() > half

    # wave 3: nothing new -> nothing committed
    n3 = stream_pages_to_store(spark, str(pages_dir), store, dico)
    assert n3 == 0
