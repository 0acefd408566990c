"""File sources/sinks — CSV, Excel, parquet, with extension dispatch.

Reference surface (``dags/dag_etl_minio_to_postgres.py``):

* S1 ``read_files_minio`` CSV branch (``:44-45``): whole-object
  ``pd.read_csv`` — here a partitioned, schema-declared ``spark.read.csv``
  that splits large files across executors and never pays an inference scan
  when a schema is supplied.
* S2 Excel branch (``:42-43``): ``pd.read_excel``.  Excel is a binary,
  non-splittable format confined to metadata-sized files (SURVEY.md §7);
  the shim parses on the driver with pandas and ships the rows out via
  ``createDataFrame``.  Gated behind an import-try — openpyxl may be absent.
* S3 extension dispatch (``:35-36,42-47``): route by suffix, raise on
  unsupported.
* S4 ``write_files_minio`` (``:53-68``): CSV sink with overwrite semantics
  and bucket bootstrap.  ``df.write.csv`` handles both the local FS and
  ``s3a://`` URIs (object stores need no mkdir — keys imply their "folders";
  MinIO bucket creation itself is a one-time deployment step, not an engine
  concern).  ``single_file=True`` mirrors the reference's one-object-per-
  table layout; the default keeps one file per partition, which is the only
  layout that scales.

Paths may be local, ``file://``, or ``s3a://`` — the s3a endpoint for MinIO
is configured on the session (``session.ObjectStoreConfig``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.naming import normalize_filename

CSV_EXTENSIONS = {".csv"}
EXCEL_EXTENSIONS = {".xlsx", ".xls"}
PARQUET_EXTENSIONS = {".parquet"}
JSONL_EXTENSIONS = {".jsonl", ".json", ".ndjson"}
ORC_EXTENSIONS = {".orc"}


def _extension(path: str) -> str:
    return os.path.splitext(path)[1].lower()


def _local_path(path: str) -> str:
    """Resolve a path to a plain local filesystem path, or raise.

    The in-place rewrite helpers swap directories with ``os.replace`` —
    local-FS only; object stores have no rename, so there the pattern is
    stage-to-new-prefix + flip the reader path.
    """
    if path.startswith("file://"):
        from urllib.parse import urlparse

        return urlparse(path).path
    if "://" in path:
        raise ValueError(
            "in-place rewrite is local-FS only (swap uses os.replace); on "
            "object stores stage to a new prefix and flip the reader path"
        )
    return path


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool | None = None,
) -> DataFrame:
    """Partitioned CSV scan (S1).  Prefer an explicit ``schema``; schema
    inference costs a full extra pass over the data at scale."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        infer = True if infer_schema is None else infer_schema
        reader = reader.option("inferSchema", str(infer).lower())
    return reader.csv(path)


def _read_xlsx_minimal(path: str) -> tuple[list[str], list[list]]:
    """Dependency-free xlsx parse (header row + data rows).

    An .xlsx is a zip of XML parts; this reads ``xl/sharedStrings.xml`` and
    the first worksheet, resolving shared-string cells and plain numbers —
    sufficient for metadata-sized workbooks like the 66-row field config.
    Driver-side by design: Excel is binary and non-splittable (SURVEY.md §7
    hard-part 6), so it must never sit on a data path.
    """
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", ns):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        sheet_names = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheet found in {path!r}")
        root = ET.fromstring(z.read(sheet_names[0]))

        def col_index(ref: str | None, fallback: int) -> int:
            # "B7" -> 1; blank cells are OMITTED from the XML, so the r=
            # reference (not list position) decides the column.
            if not ref:
                return fallback
            letters = "".join(ch for ch in ref if ch.isalpha())
            idx = 0
            for ch in letters:
                idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
            return idx - 1 if idx else fallback

        rows: list[list] = []
        for row in root.iter(
            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"
        ):
            values: list = []
            for pos, cell in enumerate(row.findall("m:c", ns)):
                i = col_index(cell.get("r"), pos)
                while len(values) <= i:
                    values.append(None)
                v = cell.find("m:v", ns)
                if v is None or v.text is None:
                    values[i] = None
                elif cell.get("t") == "s":
                    values[i] = shared[int(v.text)]
                elif cell.get("t") == "str":
                    values[i] = v.text
                else:
                    num = float(v.text)
                    values[i] = int(num) if num.is_integer() else num
            rows.append(values)
    if not rows:
        raise ValueError(f"empty worksheet in {path!r}")
    header = [str(h) for h in rows[0]]
    width = len(header)
    data = [
        (r + [None] * (width - len(r)))[:width] for r in rows[1:]
    ]
    return header, data


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: int | str = 0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Driver-side Excel parse -> DataFrame (S2).  Metadata-sized files only
    (the field-config workbook is 66 rows).  Uses pandas+openpyxl when
    available, else a dependency-free minimal xlsx parser."""
    try:
        import openpyxl  # noqa: F401 — pandas' xlsx engine
        has_engine = True
    except ImportError:
        has_engine = False

    if has_engine:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet)
        if schema is not None:
            return spark.createDataFrame(pdf, schema=schema)
        return spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))

    header, data = _read_xlsx_minimal(path)
    if schema is not None:
        return spark.createDataFrame(data, schema=schema)
    if not data:
        # Header-only workbook: typed empty frame, workbook column order.
        empty = T.StructType([T.StructField(h, T.StringType()) for h in header])
        return spark.createDataFrame([], schema=empty)
    # Pass names (not dicts) so workbook column order survives inference.
    return spark.createDataFrame(data, schema=header)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Line-delimited JSON scan — THE interchange format of training-data
    pipelines (one document per line splits cleanly across executors).

    Always pass ``schema`` on a data path: without one Spark pays a full
    inference pre-scan of every file.  Malformed lines do not kill the
    job (PERMISSIVE mode): with ``corrupt_col`` set, the raw offending
    line lands in that column (add it to the schema to triage bad
    records); set ``corrupt_col=None`` to silently null-row them.
    Multi-line (pretty-printed array) JSON is deliberately unsupported —
    it is non-splittable and has no place at scale.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        if schema is not None and corrupt_col not in schema.fieldNames():
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_col, T.StringType())]
            )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    single_file: bool = False,
) -> str:
    """JSONL sink (one object per partition; optionally gzip'd).  NULL
    fields are omitted per line (JSON convention) — lossless only under a
    declared read schema, which :func:`read_jsonl` demands anyway."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return path


def read_file(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    **kwargs,
) -> DataFrame:
    """Extension dispatch (S3): CSV / Excel / parquet / JSONL / ORC, raise
    on unsupported (reference raises at ``:46-47``)."""
    ext = _extension(path)
    if ext in CSV_EXTENSIONS:
        return read_csv(spark, path, schema=schema, **kwargs)
    if ext in EXCEL_EXTENSIONS:
        return read_excel(spark, path, schema=schema, **kwargs)
    if ext in JSONL_EXTENSIONS:
        return read_jsonl(spark, path, schema=schema, **kwargs)
    if ext in PARQUET_EXTENSIONS or ext in ORC_EXTENSIONS:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        fmt = "parquet" if ext in PARQUET_EXTENSIONS else "orc"
        return reader.format(fmt).load(path)
    raise ValueError(f"unsupported file type {ext!r} for {path!r}")


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> str:
    """CSV sink with overwrite semantics (S4).  ``single_file`` coalesces to
    one output object (the reference's layout, ``:66``) — only for small
    tables; the partitioned default is the layout that scales."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)
    return path


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """ORC columnar sink — parquet's sibling for warehouses standardized on
    ORC (Hive/Trino estates); same Spark-native vectorized reader."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Engine-native columnar sink — the store the 100 TB path lands in
    (Postgres stays a serving sink only, SURVEY.md §7 hard-part 5)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> str:
    """Range-partition + sort-within-partitions parquet sink: the
    data-skipping layout for the 100 TB store.

    ``repartitionByRange(sort_cols)`` gives every output file a DISJOINT
    value range and ``sortWithinPartitions`` orders rows inside it, so
    parquet row-group min/max statistics become tight and non-overlapping
    — a later ``WHERE sort_col BETWEEN ...`` scan prunes whole files and
    row groups instead of reading everything (the same reason warehouses
    Z-order/cluster their fact tables).  Without the sort, every file
    spans the full value range and min/max stats prune nothing.
    ``n_files`` overrides the range-partition count (e.g. to bound file
    count on small dimensions); the sampled range boundaries keep output
    files balanced even on skewed keys.
    """
    cols = [F.col(c) for c in sort_cols]
    if n_files is not None:
        ranged = df.repartitionByRange(n_files, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
    return path


def zorder_value_sql(cols: list[str], bits: int = 10) -> str:
    """Morton (Z-order) curve value over ``cols`` as ONE SQL text —
    interleave bit ``i`` of column ``j`` into position ``i*len(cols)+j``
    of the output.  Generated once and shared VERBATIM between the
    engine (``F.expr``) and the DuckDB oracle (both engines parse the
    same ``>>``/``&`` integer operators), so the curve value is
    identical by construction — the determinism policy every layout
    operator in this repo follows.

    Inputs must be NON-NEGATIVE integers already bucketed into
    ``[0, 2**bits)``: the curve reads only the low ``bits`` bits, so an
    out-of-range value aliases onto an unrelated curve position and
    breaks locality (bucket upstream with ``%`` or a range rank).
    ``bits * len(cols)`` must stay < 63 to fit the bigint."""
    if not cols:
        raise ValueError("zorder_value_sql: cols must be non-empty")
    if bits * len(cols) >= 63:
        raise ValueError("zorder_value_sql: bits*len(cols) must fit a bigint")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            shift = i * len(cols) + j
            terms.append(f"((({c}) >> {i}) & 1) * {1 << shift}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_rank_buckets(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    sample_rate: float = 0.2,
    prefix: str = "_zb_",
) -> tuple[DataFrame, list[str]]:
    """Map arbitrary ORDERABLE columns (doubles, timestamps cast to
    epoch, skewed bigints) into ``[0, 2**bits)`` rank buckets — the
    general-input front end of :func:`write_zorder_parquet`, which
    needs pre-bucketed non-negative ints.  A raw ``%`` bucket destroys
    locality on skewed or continuous domains; RANK buckets (quantile
    cutpoints) give every bucket the same row mass, which is what makes
    the interleaved curve's hyper-rectangles equal-sized.

    Cutpoints are exact percentiles of a deterministic value-hash
    sample (``xxhash64`` of the row's zorder columns — no id column
    needed, identical sample on any layout/rerun), estimated for ALL
    columns in ONE sample aggregate and broadcast back; each bucket id
    is a narrow scan-stage lookup.  ``sample_rate`` bounds percentile
    state exactly as in ``quantile_buckets_sampled`` — at 100 TB pick
    the rate that bounds the sample, not a fixed fraction.

    Contract edge: an EMPTY sample (rate too low for the input size)
    yields NULL cutpoints → NULL buckets → NULL curve values, which all
    range-partition together (no crash, but no locality) — size the
    rate to the data.

    Returns ``(df + bucket columns, bucket column names)`` ready to
    pass to :func:`write_zorder_parquet`."""
    n_cuts = (1 << bits) - 1
    probs = [(j + 1) / (1 << bits) for j in range(n_cuts)]
    draw = (
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(2**32)).cast(
            "double"
        )
        / F.lit(float(2**32))
    )
    sample = df.where(draw < F.lit(float(sample_rate)))
    cuts = sample.agg(
        *[
            F.percentile(
                F.col(c).cast("double"),
                F.array(*[F.lit(p) for p in probs]),
            ).alias(f"_cuts_{c}")
            for c in cols
        ]
    )
    out = df.crossJoin(F.broadcast(cuts))
    names = []
    for c in cols:
        bucket = F.aggregate(
            F.col(f"_cuts_{c}"),
            F.lit(0),
            lambda acc, cut: acc
            + F.when(F.col(c).cast("double") >= cut, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        names.append(f"{prefix}{c}")
        out = out.withColumn(f"{prefix}{c}", bucket.cast("long"))
    return out.drop(*[f"_cuts_{c}" for c in cols]), names


def write_zorder_parquet(
    df: DataFrame,
    zorder_cols: list[str],
    path: str,
    bits: int = 10,
    mode: str = "overwrite",
    n_files: int | None = None,
    rank_bucket: bool = False,
    sample_rate: float = 0.2,
) -> str:
    """Z-order clustered parquet sink — the MULTI-column data-skipping
    layout (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` pattern on plain
    parquet).  :func:`write_sorted_parquet` makes ONE column's min/max
    statistics tight; a 100 TB fact table is queried on several
    (user AND time, tenant AND key), and a single-column sort leaves
    every other column's per-file range at the full domain — zero
    pruning.  Interleaving the columns' bits onto one space-filling
    curve gives every output file a small HYPER-RECTANGLE of the value
    space instead of a slab: each file's min/max stats are tight on
    EVERY interleaved column at once, so a predicate on any of them
    prunes files (at k files and 2 columns, per-file span shrinks
    ~1/sqrt(k) per dimension vs 1/k on one and 1 on the other).

    Same execution shape as the single-column sink: one range exchange
    on the curve value (sampled boundaries keep files balanced even on
    skewed curves), sort within partitions, the helper column dropped
    before the write — the layout costs one shuffle, reads cost
    nothing.  ``zorder_cols`` must be pre-bucketed non-negative ints
    (see :func:`zorder_value_sql`) — or pass ``rank_bucket=True`` to
    bucket arbitrary orderable columns through
    :func:`zorder_rank_buckets` first (equal-mass quantile buckets, one
    sample aggregate; the bucket helper columns never land in the
    files)."""
    helper_cols = ["_zval"]
    if rank_bucket:
        df, bucket_cols = zorder_rank_buckets(
            df, zorder_cols, bits=bits, sample_rate=sample_rate
        )
        zorder_cols = bucket_cols
        helper_cols += bucket_cols
    z = F.expr(zorder_value_sql(zorder_cols, bits))
    zdf = df.withColumn("_zval", z)
    if n_files is not None:
        ranged = zdf.repartitionByRange(n_files, F.col("_zval"))
    else:
        ranged = zdf.repartitionByRange(F.col("_zval"))
    (
        ranged.sortWithinPartitions("_zval")
        .drop(*helper_cols)
        .write.mode(mode)
        .parquet(path)
    )
    return path


def recluster_zorder_parquet(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    bits: int = 10,
    n_files: int | None = None,
    rank_bucket: bool = False,
    sample_rate: float = 0.2,
) -> str:
    """Re-cluster an EXISTING parquet location onto the Z-order curve
    in place — the OPTIMIZE-after-ingest half of the data-skipping
    story (Delta's ``OPTIMIZE ... ZORDER BY`` run on a schedule):
    streaming/incremental appends land one curve-oblivious file per
    batch, so per-file min/max spans widen back toward the full domain
    as batches accumulate; this housekeeping pass restores the tight
    hyper-rectangles :func:`write_zorder_parquet` produces, folding
    the per-batch fragmentation in the same rewrite.

    Same plan as the one-shot sink (one sampled range exchange on the
    curve value, in-partition sort, helpers dropped), staged and then
    atomically swapped via :func:`_rewrite_in_place` — every failure
    point leaves a complete copy.  Run between cleanly-terminated
    ingest runs, like the other compaction helpers.  At 100 TB the
    production form scopes the rewrite to partitions touched since the
    last pass (re-sort only those directories under dynamic partition
    overwrite) rather than the whole table; at any scale the read side
    needs no change — pruning reads the same footer stats either way.
    A hive-partitioned location is REFUSED: this rewrite stages flat,
    which would silently demote the partition columns to data columns
    and break every reader that relies on directory pruning — use
    :func:`recluster_zorder_partitions`, which re-sorts per partition
    and preserves the layout.  Returns ``path``."""
    lpath = _local_path(path)
    # guard only when the path exists as a directory — a missing path
    # falls through to the parquet read, whose AnalysisException is the
    # canonical missing-input error (not a bare FileNotFoundError here)
    hive_dirs = (
        [
            e
            for e in os.listdir(lpath)
            if "=" in e
            and not e.startswith(("_", "."))
            and os.path.isdir(os.path.join(lpath, e))
        ]
        if os.path.isdir(lpath)
        else []
    )
    if hive_dirs:
        shown = sorted(hive_dirs)[:3]
        more = "..." if len(hive_dirs) > 3 else ""
        raise ValueError(
            f"recluster_zorder_parquet: {path!r} is hive-partitioned "
            f"(found {shown}{more}) — an in-place flat "
            "rewrite would demote the partition columns and break "
            "directory pruning; use recluster_zorder_partitions to "
            "re-sort within the partition layout"
        )
    df = spark.read.parquet(lpath)
    staged = _zorder_staged(
        df, zorder_cols, bits, n_files, rank_bucket, sample_rate
    )
    return _rewrite_in_place(staged, path)


def _zorder_staged(
    df: DataFrame,
    zorder_cols: list[str],
    bits: int,
    n_files: int | None,
    rank_bucket: bool,
    sample_rate: float,
) -> DataFrame:
    """The shared recluster plan (one sampled range exchange on the
    curve value, in-partition sort, helpers dropped) — identical for
    the local-swap and manifest-committed variants, so they are
    value-equal by construction."""
    helper_cols = ["_zval"]
    zcols = list(zorder_cols)
    if rank_bucket:
        df, bucket_cols = zorder_rank_buckets(
            df, zcols, bits=bits, sample_rate=sample_rate
        )
        zcols = bucket_cols
        helper_cols += bucket_cols
    zdf = df.withColumn("_zval", F.expr(zorder_value_sql(zcols, bits)))
    if n_files is not None:
        ranged = zdf.repartitionByRange(n_files, F.col("_zval"))
    else:
        ranged = zdf.repartitionByRange(F.col("_zval"))
    return ranged.sortWithinPartitions("_zval").drop(*helper_cols)


def recluster_zorder_committed(
    spark: SparkSession,
    root: str,
    zorder_cols: list[str],
    bits: int = 10,
    n_files: int | None = None,
    rank_bucket: bool = False,
    sample_rate: float = 0.2,
    keep_last: int = 1,
    zone_map_cols: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] = (),
    verify_row_count: bool = True,
) -> int:
    """The OBJECT-STORE face of :func:`recluster_zorder_parquet` — the
    same recluster plan committed through the manifest protocol
    (``sources/manifest.commit_parquet_generation``) instead of the
    local-FS ``os.replace`` swap, closing the family's last
    local-only gap: works over ``file://`` URIs, HDFS, and s3a, a
    crash at any point leaves the previous generation servable, and
    ``keep_last`` is the usual GC grace window.

    The consumer contract is the ONE difference from the local
    variant: readers must resolve — ``manifest.read_resolved(spark,
    root)`` (one extra listStatus, then the identical parquet scan) or
    a ``manifest.create_resolving_view`` refreshed per maintenance
    cycle.  A plain ``spark.read.parquet(root)`` consumer would see
    the pre-manifest payload (or nothing after its GC), which is why
    :func:`recluster_zorder_parquet` refuses URI paths rather than
    silently switching protocols: adopting THIS variant is an explicit
    reader migration, per RUNBOOK §5b.  Hive-partitioned layouts are
    refused for the same reason as the flat variant (a flat rewrite
    demotes partition columns — use
    :func:`recluster_zorder_partitions`).  ``zone_map_cols`` writes
    the per-file min/max ``_zonemap`` sidecar into the new generation
    before the publish (``manifest.write_zone_maps``) — the natural
    pairing: the z-order layout makes every file a tight
    hyper-rectangle, the sidecar lets ``manifest.zone_map_scan`` skip
    non-overlapping files at PLANNING time (one sidecar read instead
    of a footer GET per file).  ``bloom_cols`` likewise writes the
    per-file ``_bloom`` point-lookup sidecar
    (``manifest.write_bloom_filters``) in the same commit — range
    skipping from the layout, key skipping from the filters, one
    atomic flip.

    ``verify_row_count`` (default ON): a re-cluster is row-preserving
    BY DEFINITION, so the commit validates the STAGED generation's
    row count against the source generation's before the publish
    (``pre_publish_validate`` with the staged path — two
    footer-metadata count jobs, no data read) and refuses to serve a
    row-dropping rewrite: the compaction-bug class where an OPTIMIZE
    silently loses rows is caught while yesterday's generation is
    still the snapshot, instead of by a later ``snapshot_diff``
    audit after the damage served.  Returns the committed sequence
    number."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        _list_names,
        commit_parquet_generation,
        resolve_data_root,
    )

    data_root = resolve_data_root(spark, root)
    hive_dirs = [
        n
        for n in _list_names(spark, data_root)
        if "=" in n and not n.startswith(("_", "."))
    ]
    if hive_dirs:
        shown = sorted(hive_dirs)[:3]
        more = "..." if len(hive_dirs) > 3 else ""
        raise ValueError(
            f"recluster_zorder_committed: {root!r} is hive-partitioned "
            f"(found {shown}{more}) — a flat committed rewrite would "
            "demote the partition columns and break directory pruning; "
            "use recluster_zorder_partitions on a local path"
        )
    df = spark.read.parquet(data_root)
    staged = _zorder_staged(
        df, zorder_cols, bits, n_files, rank_bucket, sample_rate
    )
    guard = None
    if verify_row_count:
        expected = df.count()  # footer-metadata job over the source gen

        def guard(staged_path: str) -> None:
            got = spark.read.parquet(staged_path).count()
            if got != expected:
                raise RuntimeError(
                    f"recluster_zorder_committed: staged generation at "
                    f"{staged_path!r} holds {got} rows but the source "
                    f"generation holds {expected} — a re-cluster is "
                    "row-preserving by definition; refusing to publish "
                    "(previous generation keeps serving)"
                )

    return commit_parquet_generation(
        spark, staged, root, keep_last=keep_last,
        zone_map_cols=tuple(zone_map_cols),
        bloom_cols=tuple(bloom_cols),
        pre_publish_validate=guard,
    )


def recluster_zorder_partitions(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    partition_col: str,
    partitions: list | None = None,
    bits: int = 10,
    n_files: int | None = None,
    rank_bucket: bool = False,
    sample_rate: float = 0.2,
) -> list[str]:
    """PARTITION-SCOPED Z-order re-cluster of a hive-partitioned table
    — the true Delta ``OPTIMIZE ... WHERE`` shape:
    :func:`recluster_zorder_parquet` rewrites the whole location, but a
    100 TB fact table partitioned by day only ever fragments in the
    partitions the last ingest touched, so this pass re-sorts ONLY the
    named ``partitions`` (or every partition when ``None``) and leaves
    the rest byte-untouched — rewrite cost proportional to the touched
    data, not the table.

    One job reads the selected partitions through a partition-pruned
    scan, range-exchanges on (partition, curve value), sorts within
    tasks, and stages the result hive-partitioned to a sibling tmp;
    each staged partition directory is then swapped in with the same
    old-aside / promote / delete-last dance as
    :func:`_rewrite_in_place` — per-partition atomic, every failure
    point leaves a complete copy of each partition under its name or
    a marked sibling.  Untouched partitions are never read, staged, or
    replaced.  Local-FS only (directory swaps).  Returns the list of
    partition directory names swapped."""
    import shutil

    path = _local_path(path)
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.where(F.col(partition_col).isin(list(partitions)))
    helper_cols = ["_zval"]
    zcols = list(zorder_cols)
    if rank_bucket:
        df, bucket_cols = zorder_rank_buckets(
            df, zcols, bits=bits, sample_rate=sample_rate
        )
        zcols = bucket_cols
        helper_cols += bucket_cols
    zdf = df.withColumn("_zval", F.expr(zorder_value_sql(zcols, bits)))
    # explicit task count pins the file fan-out per touched partition
    # (without it AQE coalesces a small rewrite into one file, undoing
    # the multi-file hyper-rectangle layout the pass exists to restore)
    if n_files is not None:
        ranged = zdf.repartitionByRange(
            int(n_files), F.col(partition_col), F.col("_zval")
        )
    else:
        ranged = zdf.repartitionByRange(
            F.col(partition_col), F.col("_zval")
        )
    staged = ranged.sortWithinPartitions(partition_col, "_zval").drop(
        *helper_cols
    )
    tmp = path.rstrip("/") + "__recluster_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        staged.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    swapped = []
    for name in sorted(os.listdir(tmp)):
        if not name.startswith(f"{partition_col}="):
            continue
        src = os.path.join(tmp, name)
        dst = os.path.join(path, name)
        old = dst + "__recluster_old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(dst):
            os.replace(dst, old)
        os.replace(src, dst)
        shutil.rmtree(old, ignore_errors=True)
        swapped.append(name)
    shutil.rmtree(tmp, ignore_errors=True)
    return swapped


def upsert_parquet(
    df: DataFrame,
    path: str,
    key_cols: list[str],
) -> str:
    """Keyed upsert into a parquet location without a lakehouse format:
    read-modify-overwrite where incoming rows win on key collision.

    Correct and simple at dimension scale (the medallion serving tables);
    at fact scale use partition-scoped overwrite (``partition_by`` on write
    + ``replaceWhere``-style pruning) or a table format with MERGE —
    rewriting 100 TB per upsert is not a plan.
    """
    spark = df.sparkSession
    path = _local_path(path)
    if os.path.exists(path):
        existing = spark.read.schema(df.schema).parquet(path)
        survivors = existing.join(
            df.select(*key_cols).dropDuplicates(key_cols),
            on=key_cols,
            how="left_anti",
        )
        merged = survivors.unionByName(df)
    else:  # first write: nothing to merge
        merged = df
    return _rewrite_in_place(merged, path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    schema: T.StructType | None = None,
) -> str:
    """Small-file compaction: rewrite a parquet location into
    ``target_files`` files.  Streaming/incremental appends fragment
    locations into many tiny files; scans then pay per-file open + footer
    costs.  Run this as housekeeping on landing zones."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path).coalesce(target_files)
    return _rewrite_in_place(df, path)


def _rewrite_in_place(
    df: DataFrame, path: str, extra_files: dict[str, str] | None = None
) -> str:
    """Overwriting a location the plan also READS would delete its own
    input; stage to a sibling tmp location, then swap — fully distributed
    (no driver-side collect), one extra rename on local FS / object copy on
    stores without rename.

    Crash safety: the old data is renamed aside (``__rewrite_old``) before
    the staged copy is promoted, and deleted only last — every failure
    point leaves at least one complete copy under the target name or a
    clearly-marked sibling, never an empty target with orphaned data.

    ``extra_files`` (name -> text content) are written into the staged
    directory BEFORE the swap, so they become visible atomically with
    the data they describe — the hook the streaming rollup uses to
    commit its replay marker in the same rename as the merged table.
    Names must start with ``_`` or ``.`` (Spark's parquet reader ignores
    such files; anything else would corrupt the table)."""
    import shutil

    path = _local_path(path)
    tmp = path.rstrip("/") + "__rewrite_tmp"
    old = path.rstrip("/") + "__rewrite_old"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    for name, content in (extra_files or {}).items():
        if not name.startswith(("_", ".")):
            raise ValueError(
                f"extra file {name!r} must start with '_' or '.' so the "
                "parquet reader ignores it"
            )
        with open(os.path.join(tmp, name), "w", encoding="utf-8") as f:
            f.write(content)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return path


def bronze_path(base: str, file_name: str, folder: str = "bronze-files") -> str:
    """Normalized bronze object path (S4/S5: reference lowers + de-spaces the
    object key at ``:60``)."""
    return os.path.join(base, folder, normalize_filename(file_name))


def ingest_bronze(
    spark: SparkSession,
    raw_path: str,
    bronze_base: str,
    schema: T.StructType | None = None,
    **kwargs,
) -> tuple[DataFrame, str]:
    """O1 bronze stage: read raw CSV/Excel, land as CSV under the bronze
    prefix (reference ``:253-265``), return (frame, bronze path).  The
    returned frame is the *read* lineage — downstream stages compose on it
    lazily instead of re-reading bronze (collapses the reference's double
    read, ``:277,287``)."""
    df = read_file(spark, raw_path, schema=schema, **kwargs)
    name = os.path.splitext(os.path.basename(raw_path))[0] + ".csv"
    out = bronze_path(bronze_base, name)
    write_csv(df, out, mode="overwrite", single_file=False)
    return df, out


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with SCHEMA EVOLUTION: files written under different
    schema versions (a bronze landing zone where upstream added columns
    over time) read as one frame with the UNION schema; files missing a
    column surface NULL for it.

    Cost note for the 100 TB posture: ``mergeSchema`` reconciles footers
    across data files at planning time — fine for a landing zone, wrong
    for the curated store, where the schema should be DECLARED
    (schemas.py) so planning reads zero footers and the scan stays
    ReadSchema-pruned.  This reader is the exploratory/bronze entry
    point; silver and beyond go through the declared-schema catalog.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)
