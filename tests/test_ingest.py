"""End-to-end ingest job: sink parity, resume-from-checkpoint, round-trip."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from clp_spark.plans import ingest as I
from clp_spark.plans import pipeline as P
from clp_spark.sources.transcripts import dim_role, dim_tool, load_transcripts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def archive(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("archive"))
    t = load_transcripts(spark, SF_DIR)
    manifest = I.ingest(
        spark, t, out, dim_role=dim_role(spark), dim_tool=dim_tool(spark)
    )
    return out, manifest


def test_sink_count_parity(spark, archive):
    out, manifest = archive
    t = load_transcripts(spark, SF_DIR)
    n = t.count()
    assert manifest["metrics"]["n_turns"] == n

    msgs = spark.read.parquet(os.path.join(out, "messages"))
    assert msgs.count() == n

    # routed-row equality: every (conv_id, turn_idx) lands in exactly the
    # bucket derived from its logtype hash
    parsed = P.parse_encode(t)
    expect = parsed.select(
        "conv_id", "turn_idx", F.pmod("logtype_id", F.lit(16)).cast("int").alias("b")
    )
    got = msgs.select("conv_id", "turn_idx", F.col("logtype_bucket").alias("b"))
    assert expect.exceptAll(got).count() == 0 and got.exceptAll(expect).count() == 0

    # aggregate sinks match direct recomputation
    cl = spark.read.parquet(os.path.join(out, "counts_logtype"))
    direct = P.per_logtype_counts(parsed)
    assert sorted(map(tuple, cl.collect())) == sorted(map(tuple, direct.collect()))

    # lineage covers every bucket and sums to n
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    rows = {r["logtype_bucket"]: r["n_rows"] for r in lin.collect()}
    assert sum(rows.values()) == n
    buckets = {r["logtype_bucket"] for r in msgs.select("logtype_bucket").distinct().collect()}
    assert set(rows) == buckets


def test_roundtrip_decode(spark, archive):
    out, _ = archive
    t = load_transcripts(spark, SF_DIR)
    dec = I.decode_archive(spark, out).withColumnRenamed("text", "dec_text")
    joined = dec.join(t.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"])
    assert joined.count() == t.count()
    assert joined.filter("dec_text != text").count() == 0


def test_resume_skips_completed_steps(spark, archive):
    out, _ = archive
    manifest = I.read_manifest(out)
    # mark a sink step incomplete and delete it; resume should rebuild ONLY it
    del manifest["steps"]["counts_conv"]
    I._write_manifest(out, manifest)
    shutil.rmtree(os.path.join(out, "counts_conv"))
    before_msgs_mtime = os.path.getmtime(os.path.join(out, "messages"))

    t = load_transcripts(spark, SF_DIR)
    m2 = I.ingest(spark, t, out, dim_role=dim_role(spark), dim_tool=dim_tool(spark))
    assert "counts_conv" in m2["steps"]
    assert os.path.getmtime(os.path.join(out, "messages")) == before_msgs_mtime
    cc = spark.read.parquet(os.path.join(out, "counts_conv"))
    assert cc.count() == t.select("conv_id").distinct().count()


def test_crash_leaves_no_partial_sink(spark, tmp_path):
    out = str(tmp_path / "arch")
    t = load_transcripts(spark, SF_DIR)

    boom = RuntimeError("injected")
    orig = I._commit
    calls = {"n": 0}

    def failing_commit(fn, out_dir, step, *args, **kwargs):
        calls["n"] += 1
        if step == "logtype_dict":
            raise boom
        return orig(fn, out_dir, step, *args, **kwargs)

    I._commit = failing_commit
    try:
        with pytest.raises(RuntimeError):
            I.ingest(spark, t, out)
    finally:
        I._commit = orig

    # messages committed, logtype_dict absent (not half-written), manifest
    # reflects exactly the completed steps
    assert os.path.isdir(os.path.join(out, "messages"))
    assert not os.path.isdir(os.path.join(out, "logtype_dict"))
    m = I.read_manifest(out)
    assert "messages" in m["steps"] and "logtype_dict" not in m["steps"]

    # resume completes the job without rewriting messages
    mtime = os.path.getmtime(os.path.join(out, "messages"))
    I.ingest(spark, t, out)
    assert os.path.getmtime(os.path.join(out, "messages")) == mtime
    assert os.path.isdir(os.path.join(out, "logtype_dict"))


def test_compaction_preserves_rows(spark, archive):
    out, _ = archive
    msgs_dir = os.path.join(out, "messages")
    buckets = [
        int(d.split("=")[1])
        for d in os.listdir(msgs_dir)
        if d.startswith("logtype_bucket=")
    ]
    b = buckets[0]
    bucket_dir = os.path.join(msgs_dir, f"logtype_bucket={b}")
    before = spark.read.parquet(bucket_dir).count()
    I.compact_bucket(spark, out, b, target_files=1)
    files = [f for f in os.listdir(bucket_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(bucket_dir).count() == before


def test_archive_selection_and_multi_archive_search(spark, tmp_path):
    from pyspark.sql import functions as F

    t = load_transcripts(spark, SF_DIR)
    mid = t.approxQuantile("turn_idx", [0.5], 0)[0]
    early = t.filter(F.col("turn_idx") < 4)
    late = t.filter(F.col("turn_idx") >= 4)
    a1, a2 = str(tmp_path / "arch1"), str(tmp_path / "arch2")
    I.ingest(spark, early, a1, dataset="prod", tags=("blue",))
    I.ingest(spark, late, a2, dataset="prod", tags=("green",))

    m1, m2 = I.read_manifest(a1), I.read_manifest(a2)
    assert m1["tags"] == ["blue"] and m2["dataset"] == "prod"
    assert m1["metrics"]["begin_ts_ms"] <= m1["metrics"]["end_ts_ms"]

    # tag restriction
    assert I.select_archives([a1, a2], tags=["blue"]) == [a1]
    assert set(I.select_archives([a1, a2], dataset="prod")) == {a1, a2}
    assert I.select_archives([a1, a2], dataset="other") == []
    # ts-overlap pruning: a window strictly before a2's begin keeps only a1
    assert I.select_archives([a1, a2], end_ts_ms=m2["metrics"]["begin_ts_ms"] - 1) == [a1]

    # multi-archive search returns the union of per-archive matches
    from clp_spark.plans.grep import search

    hits = I.search_archives(spark, [a1, a2], "commit BEEF")
    n1 = I.search_archives(spark, [a1], "commit BEEF").count()
    n2 = I.search_archives(spark, [a2], "commit BEEF").count()
    assert hits.count() == n1 + n2 > 0


def test_reingest_invalidates_dict_caches(spark, tmp_path):
    """ADVICE r2: re-ingesting into the same path within one session must
    not serve STALE dictionaries — a search for text that only exists in
    the second ingest would otherwise be WontMatch-pruned to empty."""
    from pyspark.sql import functions as F

    arch = str(tmp_path / "arch")
    t = load_transcripts(spark, SF_DIR)
    first = t.filter(F.col("turn_idx") < 2)
    I.ingest(spark, first, arch)
    # populate every cache layer: search + decode through the archive
    assert I.search_archives(spark, [arch], "zzqx_sentinel_token").count() == 0

    second = first.withColumn(
        "text", F.concat(F.lit("zzqx_sentinel_token "), F.col("text"))
    )
    I.ingest(spark, second, arch, resume=False)
    got = I.search_archives(spark, [arch], "zzqx_sentinel_token").count()
    assert got == first.count()  # stale dictionaries would return 0


def test_auto_compaction_by_lineage(spark, tmp_path):
    out = str(tmp_path / "arch_many")
    t = load_transcripts(spark, SF_DIR).repartition(16)  # 16 files per bucket
    I.ingest(spark, t, out)
    lin = {r["logtype_bucket"]: r["n_files"]
           for r in spark.read.parquet(os.path.join(out, "lineage")).collect()}
    assert max(lin.values()) > 4
    before = spark.read.parquet(os.path.join(out, "messages")).count()

    compacted = I.compact_archive(spark, out, max_files_per_bucket=4)
    assert compacted  # something was over the limit
    lin2 = {r["logtype_bucket"]: r["n_files"]
            for r in spark.read.parquet(os.path.join(out, "lineage")).collect()}
    assert max(lin2.values()) <= 4
    assert spark.read.parquet(os.path.join(out, "messages")).count() == before
    # rows per bucket unchanged
    l1 = {r["logtype_bucket"]: r["n_rows"]
          for r in spark.read.parquet(os.path.join(out, "lineage")).collect()}
    assert sum(l1.values()) == before


def test_readable_dictionaries(spark, archive):
    out, _ = archive
    lt, vd = I.readable_dictionaries(spark, out)
    rows = [r["logtype_readable"] for r in lt.collect()]
    assert any("<int>" in r or "<float>" in r or "<dict>" in r for r in rows)
    assert all("\x11" not in r and "\x12" not in r and "\x13" not in r for r in rows)
    assert rows == sorted(rows)
    vs = [r["var_str"] for r in vd.collect()]
    assert vs == sorted(vs) and len(vs) > 0


def _footer_chunk_meta(spark, f):
    """{column: (bloom_offset, encodings)} for row group 0, via parquet-mr
    (the JVM footer reader — pyarrow 16 / duckdb 1.0 don't expose bloom)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        cols = reader.getFooter().getBlocks().get(0).getColumns()
        out = {}
        for i in range(cols.size()):
            c = cols.get(i)
            out[c.getPath().toDotString()] = (
                c.getBloomFilterOffset(),
                c.getEncodings().toString(),
            )
    finally:
        reader.close()
    return out


def test_messages_sink_rowgroup_skip_machinery(spark, archive, tmp_path):
    """The segment-index prune analog (SURVEY §4.1), both regimes:

    1. At dictionary-encodable cardinality (this corpus), parquet-mr
       deliberately writes NO bloom for logtype_id — the dictionary page is
       the exact row-group membership filter. Assert the chunk really is
       dictionary-encoded.
    2. Past dictionary cardinality (the 100-TB regime), the SAME writer
       options must produce a real bloom filter. Assert footer offset > 0
       on a high-cardinality write through MESSAGES_PARQUET_OPTIONS, with
       a no-bloom column as negative control."""
    import glob

    out, _ = archive
    files = sorted(glob.glob(os.path.join(out, "messages", "*", "*.parquet")))
    assert files
    meta = _footer_chunk_meta(spark, files[0])
    off, encodings = meta["logtype_id"]
    assert off == -1 and "DICTIONARY" in encodings.upper(), meta

    hi = spark.range(100_000).select(
        F.xxhash64("id").alias("logtype_id"), F.col("id").alias("ts")
    )
    d = str(tmp_path / "hi")
    hi.write.mode("overwrite").options(**I.MESSAGES_PARQUET_OPTIONS).parquet(d)
    meta = _footer_chunk_meta(spark, sorted(glob.glob(d + "/*.parquet"))[0])
    assert meta["logtype_id"][0] > 0, meta
    assert meta["ts"][0] == -1, meta


def test_codec_knob_applies_to_all_sinks(spark, tmp_path):
    """Per-job compression codec (the reference's --compression knob,
    clp/streaming_compression/): every sink's parquet pages carry the
    selected codec; results are identical to the default-zstd archive."""
    import pyarrow.parquet as pq
    import glob

    out = str(tmp_path / "gz")
    t = load_transcripts(spark, SF_DIR)
    I.ingest(spark, t, out, dim_role=dim_role(spark), dim_tool=dim_tool(spark),
             codec="gzip")
    for sink in ("messages", "logtype_dict", "var_dict", "counts_logtype"):
        files = glob.glob(os.path.join(out, sink, "**", "*.parquet"),
                          recursive=True)
        assert files, sink
        md = pq.ParquetFile(files[0]).metadata
        codecs = {md.row_group(0).column(i).compression
                  for i in range(md.num_columns)}
        assert codecs == {"GZIP"}, (sink, codecs)
    n = spark.read.parquet(os.path.join(out, "messages")).count()
    assert n == load_transcripts(spark, SF_DIR).count()


def test_codec_matrix_roundtrip_and_ratio_ordering(spark, tmp_path):
    """Every supported codec produces a byte-exact decode round-trip
    (sf0.001 — cheap), and at sf0.01 (where page payloads dominate the
    parquet footer/dictionary fixed costs that drown the codec signal at
    sf0.001) the manifest compression ratios order the way the codecs
    promise: every real codec beats uncompressed, and the high-ratio tier
    (zstd default / gzip, the slot the reference's lzma occupies —
    parquet-mr has no lzma) beats snappy."""
    t_small = load_transcripts(spark, SF_DIR)
    texts = t_small.select("conv_id", "turn_idx", "text")
    for codec in ("zstd", "gzip", "snappy", "uncompressed"):
        out = str(tmp_path / f"rt_{codec}")
        I.ingest(spark, t_small, out, dim_role=dim_role(spark),
                 dim_tool=dim_tool(spark), codec=codec)
        dec = I.decode_archive(spark, out).withColumnRenamed("text", "dec_text")
        joined = dec.join(texts, ["conv_id", "turn_idx"])
        assert joined.count() == t_small.count(), codec
        assert joined.filter("dec_text != text").count() == 0, codec

    t_big = load_transcripts(spark, "/root/testdata/sf0.01")
    ratios = {}
    for codec in ("zstd", "gzip", "snappy", "uncompressed"):
        m = I.ingest(spark, t_big, str(tmp_path / f"ratio_{codec}"),
                     dim_role=dim_role(spark), dim_tool=dim_tool(spark),
                     codec=codec)
        ratios[codec] = m["metrics"]["compression_ratio"]
    assert ratios["uncompressed"] < min(
        ratios["zstd"], ratios["gzip"], ratios["snappy"]
    ), ratios
    assert ratios["snappy"] < max(ratios["zstd"], ratios["gzip"]), ratios
