"""Pipeline DSL: a JSON stage list compiled to a DataFrame plan.

The reference's central construct (pipeline/definition.go:12
DefinitionConfig{Stages}, pipeline/stage.go NewStage) is a linear list
of stages, each an activity with settings and input/output mappings,
evaluated per event. Here a pipeline is compiled ONCE into a
DataFrame-to-DataFrame composition — Catalyst sees the whole chain and
optimizes across stage boundaries (filter pushdown through the window
stage's shuffle, column pruning to the scan), which is the Spark-first
equivalent of flogo's per-event interpreter loop.

Stage types:

- ``filter``    — operators.filters (reference activity/filter)
- ``aggregate`` — operators.windows (reference activity/aggregate);
  settings mirror the reference schema: function, windowType
  (tumbling | sliding | timeTumbling | timeSliding), windowSize,
  resolution, plus value/groupBy/orderBy column bindings
- ``map``       — computed columns from SQL expressions (flogo's
  input/output mappings; Catalyst expressions, not UDFs)
- ``select``    — projection
- ``union``     — merge another pipeline's stream (README "join
  streams from multiple event sources")
- ``join``      — keyed join with another pipeline, optional time
  bound (stream-stream join)
- ``log``       — the reference's #log activity (passthrough; its
  input mapping is still applied)

Stages also accept the reference's ``ref`` key (``"#aggregate"``) and
per-stage ``input`` / ``output`` mapping dicts with flogo mapping
expressions (``=$.attr``) — see `compile_mapping_expr` — and
`Pipeline.from_flogo_resource` lifts a stream resource out of a full
flogo app JSON (examples/agg-flogo.json shape) unchanged.

Example::

    Pipeline.from_dict({
        "name": "simple_agg",
        "source": {"table": "events"},
        "stages": [
            {"type": "filter", "settings": {"type": "non-zero", "column": "value"}},
            {"type": "aggregate", "settings": {
                "function": "sum", "windowType": "timeTumbling",
                "windowSize": 5000, "value": "value"}},
        ],
    }).run(spark, sf_dir)
"""

from __future__ import annotations

import itertools
import json
import re
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.filters import apply_filter
from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)
from stream_spark.sources import load_table


# --------------------------------------------------------------------------
# flogo mapping expressions (pipeline/stage.go inputMapper/outputMapper)
#
# A stage config may carry `input` / `output` dicts whose values are
# flogo mapping expressions: `=$.attr` resolves an attribute of the
# current pipeline scope, `=<expr>` is an expression over scope
# attributes, and a bare value is a literal. Relationally the scope IS
# the DataFrame, so `$.attr` compiles to a column reference and the
# whole mapping becomes withColumns — Catalyst expressions, evaluated
# before (input) / after (output) the stage body, exactly where the
# reference's mappers run.

# --------------------------------------------------------------------------
# pipeline telemetry (pipeline/support/telemetry.go TelemetryService:
# PipelineStarted / StageStarted / StageFinished / PipelineFinished).
# For a declarative engine the faithful stage events are plan-
# composition events (stages compose lazily; execution is one Spark
# job, whose runtime metrics come from the streaming TelemetryListener
# / Spark UI) — so emitting them here is zero-cost and side-effect
# free: no forced actions in the hot path.

_INSTANCE_SEQ = itertools.count()


class TelemetryService:
    """Same four-hook interface as the reference; subclass and
    register. Hooks receive (pipeline_id, instance_id[, stage_id],
    data)."""

    def pipeline_started(self, pipeline_id: str, instance_id: str, data: dict) -> None: ...

    def stage_started(self, pipeline_id: str, instance_id: str, stage_id: str, data: dict) -> None: ...

    def stage_finished(self, pipeline_id: str, instance_id: str, stage_id: str, data: dict) -> None: ...

    def pipeline_finished(self, pipeline_id: str, instance_id: str, data: dict) -> None: ...


_telemetry_service: TelemetryService | None = None


def register_telemetry_service(service: TelemetryService | None) -> None:
    global _telemetry_service
    _telemetry_service = service


def get_telemetry_service() -> TelemetryService | None:
    return _telemetry_service


_SCOPE_REF = re.compile(r"\$(?:pipeline)?\.([A-Za-z_][A-Za-z0-9_]*)")

#: flogo expression-language functions → Spark SQL equivalents
_FLOGO_FNS = {"string.concat": "concat", "string.length": "length"}


def compile_mapping_expr(value: Any):
    """One flogo mapping value → a Spark Column. ``$.attr`` and
    ``$pipeline.attr`` both resolve to scope (column) references —
    relationally the pipeline scope IS the row."""
    if not isinstance(value, str):
        return F.lit(value)
    if value.startswith("="):
        expr = _SCOPE_REF.sub(r"\1", value[1:].strip())
        for flogo_fn, spark_fn in _FLOGO_FNS.items():
            expr = expr.replace(flogo_fn + "(", spark_fn + "(")
        return F.expr(expr)
    return F.lit(value)


def _apply_mapping(df: DataFrame, mapping: dict[str, Any] | None) -> DataFrame:
    if not mapping:
        return df
    for name, value in mapping.items():
        # "pipeline.out" assigns scope attr `out` (stage.go outputMapper)
        df = df.withColumn(name.removeprefix("pipeline."), compile_mapping_expr(value))
    return df


def _stage_filter(df: DataFrame, s: dict, ctx: "Pipeline", spark, sf_dir) -> DataFrame:
    kwargs = {k: v for k, v in s.items() if k not in ("type", "column", "proceedOnlyOnEmit")}
    # ref-style stages name no column: the input mapping bound the
    # activity's `value` attribute (descriptor.json input metadata)
    return apply_filter(df, s["type"], s.get("column", "value"), **kwargs)


def _stage_aggregate(df: DataFrame, s: dict, ctx: "Pipeline", spark, sf_dir) -> DataFrame:
    fn = s["function"]
    wtype = s["windowType"]
    size = int(s["windowSize"])
    # accept the reference's additionalSettings schema verbatim
    # (activity/aggregate README: nameKey → group key, valueKey → value)
    extra = s.get("additionalSettings", {})
    value = s.get("value", extra.get("valueKey", "value"))
    group_by = s.get("groupBy") or ([extra["nameKey"]] if "nameKey" in extra else None)
    order_by = s.get("orderBy", ("ts", "event_id"))
    resolution = int(s.get("resolution", 1))
    # proceedOnlyOnEmit is implicit in batch: windows emit only when
    # complete, and downstream stages see only emitted rows
    s.pop("proceedOnlyOnEmit", None)
    if wtype == "tumbling":
        return tumbling_count_window(df, value, fn, size, order_cols=order_by, group_by=group_by)
    if wtype == "sliding":
        return sliding_count_window(df, value, fn, size, resolution, order_cols=order_by, group_by=group_by)
    if wtype == "timeTumbling":
        # totalCountModifier (windows.go:18, lowercased key match at
        # :29): >0 = per-window avg divisor (this engine's default); 0 =
        # the reference's global running-max divisor, honored when a
        # config asks for the default explicitly
        tcm = next(
            (int(v) for k, v in extra.items() if k.lower() == "totalcountmodifier"),
            1,
        )
        return tumbling_time_window(
            df, s.get("ts", "ts"), value, fn, size, group_by=group_by, total_count_modifier=tcm
        )
    if wtype == "timeSliding":
        return sliding_time_window(df, s.get("ts", "ts"), value, fn, size, resolution, group_by=group_by)
    raise ValueError(f"unsupported windowType: {wtype!r}")


def _stage_map(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    for name, expr in s["exprs"].items():
        df = df.withColumn(name, F.expr(expr))
    return df


def _stage_select(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    return df.select(*s["columns"])


def _stage_log(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    # The reference's #log activity only records its input-mapped
    # `message`; relationally it is a passthrough (the mapping itself
    # was applied by the input mapper).
    return df


def _stage_union(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    other = Pipeline.from_dict(s["pipeline"]).run(spark, sf_dir)
    return df.unionByName(other)


def _stage_join(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    other = Pipeline.from_dict(s["pipeline"]).run(spark, sf_dir)
    for name, expr in s.get("right_exprs", {}).items():
        other = other.withColumn(name, F.expr(expr))
    cond = F.expr(s["on"])
    how = s.get("how", "inner")
    if s.get("broadcast"):
        # explicit user opt-in in the pipeline JSON: the author asserts
        # broadcast-ok: the joined side is a bounded dimension
        other = F.broadcast(other)
    return df.alias("l").join(other.alias("r"), cond, how)


def _stage_dedup(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    """Exact dedup as a pipeline stage: keep the min-``id`` row per
    normalized content key — deterministic under any partitioning
    (dropDuplicates keeps an arbitrary row; min-id does not). A
    whole-partition window min (no orderBy — plain per-key aggregate,
    no sort) replaces the earlier groupBy + semi-join: one shuffle on
    the content key and ONE evaluation of the upstream plan, where the
    join recomputed everything above it (the expensive langid/gate
    stages of a curation pipeline) on both branches."""
    from pyspark.sql.window import Window

    from stream_spark.operators.text import md5_long, normalize_text

    text_col = s.get("column", "text")
    id_col = s.get("id", "doc_id")
    keyed = df.withColumn("_ck", md5_long(normalize_text(F.col(text_col))))
    w = Window.partitionBy("_ck")
    return (
        keyed.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_ck", "_min_id")
    )


def _stage_sample(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    """Deterministic hash-of-id sampling (operators.sampling) — the
    reproducible-dataset primitive, never ``df.sample``."""
    from stream_spark.operators.sampling import deterministic_sample

    return deterministic_sample(df, s.get("id", "doc_id"), float(s["rate"]))


def _stage_quality_gate(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    """Gopher quality gate as a declarative pipeline stage: keep rows
    passing all rules (thresholds from settings; defaults = the
    operator's paper values). With ``emit_flags: true`` the per-rule
    0/1 columns stay on the frame for rejection-rate reporting."""
    from stream_spark.operators.text import gopher_rules

    gated = gopher_rules(
        df,
        text_col=s.get("column", "text"),
        min_words=int(s.get("minWords", 50)),
        max_words=int(s.get("maxWords", 100_000)),
        min_mean_len=float(s.get("minMeanLen", 3.0)),
        max_mean_len=float(s.get("maxMeanLen", 10.0)),
        min_alpha_frac=float(s.get("minAlphaFrac", 0.8)),
        min_stop_hits=int(s.get("minStopHits", 2)),
    )
    kept = gated.filter(F.col("gopher_keep") == 1)
    if s.get("emit_flags"):
        return kept
    added = [c for c in kept.columns if c not in df.columns]
    return kept.drop(*added)


def _stage_langid(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    """Language-ID stage: adds ``predicted_lang`` (stopword-hit
    heuristic, deterministic tie-break); ``keep: [langs]`` filters to
    the allowed set — the corpus-curation language gate. Uses the
    single-expression ``langid_pred`` (one tokenization per row; the
    column-per-language variant re-inlines the split five times)."""
    from stream_spark.operators.text import langid_pred

    out = df.withColumn("predicted_lang", langid_pred(F.col(s.get("column", "text"))))
    if s.get("keep"):
        out = out.filter(F.col("predicted_lang").isin(*s["keep"]))
    return out


def _stage_media_hash(df, s, ctx, spark, sf_dir):
    """Perceptual fingerprint stage: attach an ``image``/``audio``
    aHash column keyed by ``id`` — the multimodal-curation ingest step.

    Three sources, one hash implementation:

    - default (synthetic): payloads from the deterministic profiled
      generators (the oracle-replayable decode stub); hashing is a
      keyed doc_id equi-join back onto the frame — linear, shuffle on
      the id key only.
    - ``source: "binary"`` (+ ``path``/``glob``): REAL bytes — a
      binaryFile scan of one-file-per-row payloads (ids from file
      names), native PPM/WAV decode → aHash in the same Arrow slot,
      joined back on id. The production ingest shape end to end;
      compressed formats still raise the clean PIL install hint.
    - a STREAMING frame: the join-back is not streaming-legal
      (stream-stream self-join), so generate→encode→decode→hash runs
      in one column-preserving Arrow pass
      (operators/multimodal.attach_profiled_hash — bit-identical to
      the batch path, same shared per-payload helpers)."""
    from stream_spark.operators import multimodal as mm

    modality = s["modality"]
    id_col = s.get("id", "doc_id")
    out = s.get("out", f"{modality}_hash")
    gen = s.get("generator", "profiled")
    if df.isStreaming:
        # Fail fast on settings the streaming spelling cannot honor:
        # attach_profiled_hash regenerates the PROFILED payload with the
        # fixed 7/49 parameters, so a binary source or a non-default
        # generator/hash-size here would silently hash the wrong bytes
        # (same fail-fast contract as dedup_by below).
        unsupported = {
            "source": s.get("source"),
            "generator": None if gen == "profiled" else gen,
            "hashSize": s.get("hashSize"),
            "nWindows": s.get("nWindows"),
            "path": s.get("path"),
            "glob": s.get("glob"),
        }
        bad = {k: v for k, v in unsupported.items() if v is not None}
        if bad:
            raise ValueError(
                "streaming media_hash supports only the default profiled "
                f"generator (got {bad}); run the binary/custom-parameter "
                "spelling in batch, or stream the default profiled hash"
            )
        return mm.attach_profiled_hash(df, modality, id_col=id_col, out=out)
    if s.get("source") == "binary":
        from stream_spark.sources import read_binary_files

        media = read_binary_files(
            spark, s["path"], glob=s.get("glob", "*.bin")
        ).select("doc_id", "payload")
        if modality == "image":
            h = mm.ahash_image(media, hash_size=int(s.get("hashSize", 7))).select(
                F.col("doc_id").alias(id_col), F.col("ahash").alias(out)
            )
        elif modality == "audio":
            h = mm.ahash_audio(media, n_windows=int(s.get("nWindows", 49))).select(
                F.col("doc_id").alias(id_col), F.col("audio_hash").alias(out)
            )
        else:
            raise ValueError(f"unsupported media_hash modality: {modality!r}")
        return df.join(h, id_col)
    if modality == "image":
        make = (
            mm.synthetic_profiled_image_table if gen == "profiled" else mm.synthetic_image_table
        )
        h = mm.ahash_image(
            make(df, id_col=id_col), hash_size=7 if gen == "profiled" else 4
        ).select(F.col("doc_id").alias(id_col), F.col("ahash").alias(out))
    elif modality == "audio":
        make = (
            mm.synthetic_profiled_audio_table if gen == "profiled" else mm.synthetic_audio_table
        )
        h = mm.ahash_audio(
            make(df, id_col=id_col), n_windows=49 if gen == "profiled" else 16
        ).select(F.col("doc_id").alias(id_col), F.col("audio_hash").alias(out))
    else:
        raise ValueError(f"unsupported media_hash modality: {modality!r}")
    return df.join(h, id_col)


def _stage_dedup_by(df, s, ctx, spark, sf_dir):
    """Keep the min-``id`` row per value of an EXISTING column — the
    hash-group dedup step after a media_hash stage (perceptual-hash
    exact collision dedup; the 2^16-bounded group level the image
    near-dup family deliberately works at). Same one-shuffle window-min
    shape as the text dedup stage."""
    from pyspark.sql.window import Window

    if df.isStreaming:
        raise ValueError(
            "dedup_by is a batch stage (whole-partition window min); on a "
            "stream use streaming.dedup.multi_hash_first_seen over the "
            "media_hash columns — the online first-seen register (see "
            "streaming_pipeline_multimodal)"
        )
    id_col = s.get("id", "doc_id")
    w = Window.partitionBy(s["column"])
    return (
        df.withColumn("_min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_min_id"))
        .drop("_min_id")
    )


def _stage_near_dedup(df, s, ctx, spark, sf_dir):
    """Text near-dup removal as a pipeline stage: drop the later doc of
    every exact-Jaccard pair ≥ ``threshold``, pairs generated by the
    crawl-scale banded verify-on-candidates path (operators/dedup.
    banded_jaccard_pairs — the same generator the training_data_prep
    capstone uses; recall characterized by the gated
    dedup_banded_recall eval). The anti-join shuffles on the id key;
    the dupes side is O(duplicates), never broadcast by hint."""
    from stream_spark.operators.dedup import banded_jaccard_pairs

    id_col = s.get("id", "doc_id")
    # Materialize the stage INPUT once (lazy checkpoint): in a composed
    # pipeline this frame is the output of the upstream media-hash /
    # gate stages (Arrow decode+hash passes), and near_dedup fans it to
    # FOUR consumers — the band index build, the verify-join shingle
    # sides, and the anti-join left side (plus a downstream pack's own
    # layout pin). Without the pin the Arrow passes re-execute per
    # consumer (interleaved A/B at sf0.1: construct 8.9 → 3.4 s). This
    # is the standard materialize-between-super-stages pattern at any
    # scale; blocks are ContextCleaner-freed with the frame.
    if not df.isStreaming:
        df = df.localCheckpoint(eager=False)
    pairs = banded_jaccard_pairs(
        df,
        threshold=float(s.get("threshold", 0.8)),
        text_col=s.get("column", "text"),
        id_col=id_col,
    )
    dupes = pairs.select(F.col("doc_b").alias("_dup_id")).distinct()
    return df.join(dupes, df[id_col] == dupes["_dup_id"], "left_anti")


def _stage_pack(df, s, ctx, spark, sf_dir):
    """Terminal packing stage: whitespace token counts, docs
    concatenated in ``id`` order and chunked into ``budget``-token
    contexts (operators/packing.pack_sequences — the two-pass
    partition-offset prefix sum, no single-partition sort). Output is
    the per-doc pack assignment (doc_id, n_tokens, start_offset,
    pack_id, n_packs_spanned)."""
    from stream_spark.operators.packing import pack_sequences
    from stream_spark.operators.text import token_count

    id_col = s.get("id", "doc_id")
    wt = df.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(s.get("column", "text"))).cast("long").alias("n_tokens"),
    )
    return pack_sequences(wt, budget=int(s.get("budget", 2048)))


def _stage_sink(df, s, pipe, spark, sf_dir):
    """Terminal write stage: persist the pipeline's current frame to
    parquet/csv/json, optionally hive-partitioned or z-order
    clustered (``zorder_by: [colA, colB]`` → operators/layout), then
    pass the frame through so downstream stages / the caller still see
    it (flogo pipelines end in an activity; ours can end in a table)."""
    path = s["path"]
    if s.get("zorder_by"):
        from stream_spark.operators.layout import zorder_write

        zorder_write(
            df,
            path,
            s["zorder_by"],
            bits=int(s.get("bits", 16)),
            n_files=int(s.get("n_files", 8)),
            mod=s.get("mod"),
        )
    else:
        from stream_spark.sources.sinks import write_table

        write_table(
            df, path, fmt=s.get("format", "parquet"), partition_by=s.get("partition_by")
        )
    return df


STAGE_TYPES: dict[str, Callable] = {
    "filter": _stage_filter,
    "aggregate": _stage_aggregate,
    "map": _stage_map,
    "select": _stage_select,
    "union": _stage_union,
    "join": _stage_join,
    "log": _stage_log,
    "dedup": _stage_dedup,
    "sample": _stage_sample,
    "quality_gate": _stage_quality_gate,
    "langid": _stage_langid,
    "sink": _stage_sink,
    "media_hash": _stage_media_hash,
    "dedup_by": _stage_dedup_by,
    "near_dedup": _stage_near_dedup,
    "pack": _stage_pack,
}


def encode_stream_uri(config: dict[str, Any]) -> str:
    """Inverse of ``Pipeline.from_uri``'s flogo-stream:// branch:
    gzip+base64 a definition dict into a self-contained URI
    (manager.go decodeAndUnzip, run backwards)."""
    import base64
    import gzip

    payload = gzip.compress(json.dumps(config).encode(), mtime=0)  # mtime=0: deterministic
    return "flogo-stream://" + base64.b64encode(payload).decode()


def _normalize_stage(st: dict[str, Any]) -> dict[str, Any]:
    """Accept both our `type` key and the reference's `ref` key
    (`"#aggregate"` alias form, stage.go NewStage:70)."""
    if "type" not in st and "ref" in st:
        st = {**st, "type": st["ref"].lstrip("#")}
    if st.get("type") not in STAGE_TYPES:
        raise ValueError(f"unsupported stage type: {st.get('type')!r}")
    return st


class Pipeline:
    """A compiled stage chain; ``run`` materializes the DataFrame plan."""

    def __init__(
        self,
        name: str,
        source: dict[str, Any],
        stages: list[dict[str, Any]],
        output: list[str] | None = None,
    ):
        self.name = name
        self.source = source
        self.stages = [_normalize_stage(st) for st in stages]
        self.output = output  # declared metadata.output attrs (final projection)

    @classmethod
    def from_dict(cls, config: dict[str, Any]) -> "Pipeline":
        return cls(
            config.get("name", "pipeline"),
            config["source"],
            config.get("stages", []),
            output=config.get("output"),
        )

    @classmethod
    def from_json(cls, text: str) -> "Pipeline":
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_uri(
        cls,
        uri: str,
        source: dict[str, Any],
        input_map: dict[str, Any] | None = None,
        fetch: Callable[[str], tuple[bytes, dict[str, str]]] | None = None,
    ) -> "Pipeline":
        """Remote pipeline provider — pipeline/manager.go:84-176
        (BasicRemotePipelineProvider.GetPipeline): resolve a stream
        definition by URI.

        - ``file://``  — read the file; transparently gunzip when the
          payload leads with the gzip magic (manager.go:103 sniffs
          0x1f..0x8b).
        - ``http(s)://`` — fetch; a ``flogo-compressed: true`` response
          header means base64+gzip (manager.go:144 decodeAndUnzip).
          ``fetch(uri) -> (body, lowercase_headers)`` is injectable so
          tests (and offline runs) avoid real network I/O.
        - ``flogo-stream://`` — the payload is INLINE in the URI:
          gzip+base64 of the definition JSON (``encode_stream_uri``
          builds one) — the self-contained handoff form.

        The decoded JSON may be a bare pipeline dict (``from_dict``
        schema), a flogo stream resource (``{data: {stages: ...}}``),
        or a full flogo app (``resources[]``) — dispatched by shape.
        ``source`` replaces the trigger binding as in
        ``from_flogo_resource``.
        """
        import base64
        import gzip

        def gunzip_if_compressed(b: bytes) -> bytes:
            return gzip.decompress(b) if b[:2] == b"\x1f\x8b" else b

        if uri.startswith("flogo-stream://"):
            raw = gzip.decompress(base64.b64decode(uri[len("flogo-stream://") :]))
        elif uri.startswith("file://"):
            from urllib.request import url2pathname

            with open(url2pathname(uri[len("file://") :]), "rb") as fh:
                raw = gunzip_if_compressed(fh.read())
        elif uri.startswith(("http://", "https://")):
            if fetch is None:

                def fetch(u: str) -> tuple[bytes, dict[str, str]]:
                    from urllib.request import urlopen

                    with urlopen(u) as resp:  # noqa: S310 — scheme checked above
                        return resp.read(), {k.lower(): v for k, v in resp.headers.items()}

            body, headers = fetch(uri)
            if headers.get("flogo-compressed", "").lower() == "true":
                raw = gzip.decompress(base64.b64decode(body))
            else:
                raw = gunzip_if_compressed(body)
        else:
            raise ValueError(f"unsupported stream URI scheme: {uri!r}")

        cfg = json.loads(raw)
        if "resources" in cfg:
            return cls.from_flogo_resource(cfg, source, input_map=input_map)
        if isinstance(cfg.get("data"), dict) and "stages" in cfg["data"]:
            data = cfg["data"]
            stages = list(data["stages"])
            if input_map:
                stages.insert(0, {"type": "map", "settings": {"exprs": {}}, "output": input_map})
            meta_out = [a["name"] for a in data.get("metadata", {}).get("output", [])]
            return cls(cfg.get("id", "stream"), source, stages, output=meta_out or None)
        if "stages" in cfg:
            if "source" in cfg:
                return cls.from_dict(cfg)
            return cls(cfg.get("name", "stream"), source, cfg["stages"])
        raise ValueError("unrecognized pipeline definition shape (no stages)")

    @classmethod
    def from_flogo_resource(
        cls,
        app: dict[str, Any] | str,
        source: dict[str, Any],
        input_map: dict[str, Any] | None = None,
        resource_id: str | None = None,
    ) -> "Pipeline":
        """Lift a stream resource out of a full flogo app JSON
        (examples/agg-flogo.json shape): ``resources[].data.stages``
        with per-stage ``ref`` / ``settings`` / ``input`` / ``output``.

        ``source`` replaces the app's trigger (we read a table, not an
        HTTP endpoint) and ``input_map`` plays the trigger handler's
        action-input binding — mapping the pipeline's declared input
        attrs from source columns (flogo: ``"input": "=$.pathParams.val"``).
        ``metadata.output`` becomes the final projection, which is what
        the flogo action returns per emit.
        """
        if isinstance(app, str):
            app = json.loads(app)
        resources = app.get("resources", [])
        if not resources:
            raise ValueError("no resources in flogo app config")
        res = None
        for r in resources:
            if resource_id is None or r.get("id") == resource_id:
                res = r
                break
        if res is None:
            raise ValueError(f"resource {resource_id!r} not found")
        data = res["data"]
        stages: list[dict[str, Any]] = list(data["stages"])
        if input_map:
            stages.insert(0, {"type": "map", "settings": {"exprs": {}}, "output": input_map})
        meta_out = [a["name"] for a in data.get("metadata", {}).get("output", [])]
        return cls(res.get("id", "flogo"), source, stages, output=meta_out or None)

    @classmethod
    def from_flogo_app(
        cls,
        app: dict[str, Any] | str,
        source: dict[str, Any],
        input_map: dict[str, Any] | None = None,
    ) -> "Pipeline":
        """Compose a FULL flogo app (examples/channel-flogo.json
        shape): start at the action bound to the external (non-channel)
        trigger, follow its ``settings.outputChannel`` to the channel
        trigger consuming that channel, and concatenate each stream
        resource's stages into one plan.

        A flogo channel is an intra-app handoff buffer (``"test:5"`` =
        name:size); relationally the handoff is plan composition — the
        downstream stages consume the upstream's output DataFrame, with
        the channel handler's input mapping (``$.data.attr`` → upstream
        output column) applied between them. Buffer size is a runtime
        backpressure knob with no declarative meaning and is ignored.
        Transport-specific entry bindings (``$.pathParams.*``) can't
        come from a table — bind entry inputs via ``input_map``.
        """
        if isinstance(app, str):
            app = json.loads(app)
        actions = {a["id"]: a for a in app.get("actions", [])}
        resources = {r["id"]: r for r in app.get("resources", [])}
        consumers: dict[str, tuple[str, dict[str, Any] | None]] = {}
        entry = None
        for trig in app.get("triggers", []):
            is_channel = str(trig.get("ref", "")).endswith("channel")
            for h in trig.get("handlers", []):
                aid = h.get("action", {}).get("id")
                if aid is None:
                    continue
                if is_channel:
                    consumers[h.get("settings", {}).get("channel")] = (
                        aid,
                        h.get("action", {}).get("input"),
                    )
                elif entry is None:
                    entry = aid
        if entry is None:
            raise ValueError("no externally-triggered action in flogo app")

        stages: list[dict[str, Any]] = []
        if input_map:
            stages.append({"type": "map", "settings": {"exprs": {}}, "output": input_map})
        out_meta: list[str] | None = None
        aid, seen = entry, set()
        while aid is not None and aid not in seen:
            seen.add(aid)
            action = actions[aid]
            rid = action.get("settings", {}).get("streamURI", "").removeprefix("res://")
            if rid not in resources:
                raise ValueError(f"streamURI resource {rid!r} not found")
            data = resources[rid]["data"]
            stages.extend(data["stages"])
            # the LAST resource in the chain decides the projection;
            # one that declares no output keeps the full scope
            out_meta = [a["name"] for a in data.get("metadata", {}).get("output", [])] or None
            nxt = consumers.get(action.get("settings", {}).get("outputChannel"))
            if nxt is None:
                break
            naid, nmap = nxt
            if nmap:
                stages.append(
                    {
                        "type": "map",
                        "settings": {"exprs": {}},
                        "output": {
                            k: (v.replace("$.data.", "$.") if isinstance(v, str) else v)
                            for k, v in nmap.items()
                        },
                    }
                )
            aid = naid
        return cls(app.get("name", "flogo-app"), source, stages, output=out_meta or None)

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, self.source["table"], fmt=self.source.get("format", "parquet"))
        return self.run_on(df, spark, sf_dir)

    def run_on(self, df: DataFrame, spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
        """Apply the stage chain to a given DataFrame — batch OR a
        Structured Streaming frame (the reference executes the same
        pipeline definition per live event; here the same declarative
        chain compiles onto either engine mode). Streaming callers:
        count windows (tumbling/sliding) need arrival-order row
        numbers and live in ``streaming.jobs``; time windows, filters,
        and mappings compose directly. ``union``/``join`` stages load
        their other side via ``sf_dir`` (batch only).
        """
        tel = get_telemetry_service()
        iid = f"{self.name}#{next(_INSTANCE_SEQ)}"
        if tel:
            tel.pipeline_started(self.name, iid, {"source": dict(self.source)})
        for i, st in enumerate(self.stages):
            sid = f"{i}:{st['type']}"
            if tel:
                tel.stage_started(self.name, iid, sid, {"settings": st.get("settings", {})})
            df = _apply_mapping(df, st.get("input"))
            df = STAGE_TYPES[st["type"]](df, st.get("settings", {}), self, spark, sf_dir)
            df = _apply_mapping(df, st.get("output"))
            if tel:
                tel.stage_finished(self.name, iid, sid, {"schema": df.schema.simpleString()})
        if self.output:
            df = df.select(*self.output)
        if tel:
            tel.pipeline_finished(self.name, iid, {"n_stages": len(self.stages)})
        return df
