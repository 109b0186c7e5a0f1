"""Pipeline-DSL and multi-stream queries (SURVEY §2 A7–A9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.pipeline import Pipeline
from stream_spark.queries.registry import register

_DSUM = "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"
_HOUR = 3_600_000


# --------------------------------------------------------------------------
# A7: JSON pipeline — filter → grouped time-tumbling aggregate
# (the reference's examples/agg-flogo.json + filter-flogo.json shapes)

_PIPELINE_AGG_FILTER = {
    "name": "agg_filter",
    "source": {"table": "events"},
    "stages": [
        {"type": "filter", "settings": {"type": "non-zero", "column": "value_floor"}},
        {
            "type": "aggregate",
            "settings": {
                "function": "sum",
                "windowType": "timeTumbling",
                "windowSize": _HOUR,
                "value": "value",
                "groupBy": ["event_type"],
            },
        },
        {
            "type": "map",
            "settings": {"exprs": {"window_start_ms": "unix_millis(CAST(window_start AS TIMESTAMP))"}},
        },
        {"type": "select", "settings": {"columns": ["event_type", "window_start_ms", "result"]}},
    ],
}


@register(
    "pipeline_agg_filter",
    oracle=f"""
    SELECT event_type,
           CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS window_start_ms,
           {_DSUM} AS result
    FROM events WHERE floor(value) <> 0
    GROUP BY event_type, window_start_ms
    """,
)
def pipeline_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = Pipeline.from_dict(
        {
            **_PIPELINE_AGG_FILTER,
            "stages": [
                {"type": "map", "settings": {"exprs": {"value_floor": "floor(value)"}}},
                *_PIPELINE_AGG_FILTER["stages"],
            ],
        }
    )
    return pipe.run(spark, sf_dir)


@register(
    "pipeline_from_uri",
    oracle=f"""
    SELECT event_type,
           CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS window_start_ms,
           {_DSUM} AS result
    FROM events WHERE floor(value) <> 0
    GROUP BY event_type, window_start_ms
    """,
)
def pipeline_from_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote pipeline provider under the gate (manager.go:84-176):
    the SAME definition as ``pipeline_agg_filter`` is gzip+base64
    round-tripped through a self-contained ``flogo-stream://`` URI and
    resolved by ``Pipeline.from_uri`` — identical plan, identical
    oracle. file:// (with gzip sniffing) and http:// (with the
    flogo-compressed header) resolve through the same provider
    (pytest-covered; no network in the gate)."""
    from stream_spark.pipeline import encode_stream_uri

    cfg = {
        **_PIPELINE_AGG_FILTER,
        "stages": [
            {"type": "map", "settings": {"exprs": {"value_floor": "floor(value)"}}},
            *_PIPELINE_AGG_FILTER["stages"],
        ],
    }
    return Pipeline.from_uri(encode_stream_uri(cfg), cfg["source"]).run(spark, sf_dir)


# --------------------------------------------------------------------------
# A8: stream merge — two sources unioned, windowed agg across both
# (README "Join streams from multiple event sources"; channel example)


@register(
    "stream_merge",
    oracle=f"""
    WITH merged AS (
        SELECT ts, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT ts, value FROM events WHERE event_type = 'view'
    )
    SELECT CAST((epoch_ms(ts) // {_HOUR}) * {_HOUR} AS BIGINT) AS window_start_ms,
           COUNT(value) AS result
    FROM merged GROUP BY window_start_ms
    """,
)
def stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = Pipeline.from_dict(
        {
            "name": "merge",
            "source": {"table": "events"},
            "stages": [
                {"type": "filter", "settings": {"type": "threshold", "column": "event_type", "value": "click", "op": "=="}},
                {"type": "select", "settings": {"columns": ["ts", "value", "event_id"]}},
                {
                    "type": "union",
                    "settings": {
                        "pipeline": {
                            "name": "views",
                            "source": {"table": "events"},
                            "stages": [
                                {"type": "filter", "settings": {"type": "threshold", "column": "event_type", "value": "view", "op": "=="}},
                                {"type": "select", "settings": {"columns": ["ts", "value", "event_id"]}},
                            ],
                        }
                    },
                },
                {
                    "type": "aggregate",
                    "settings": {"function": "count", "windowType": "timeTumbling", "windowSize": _HOUR, "value": "value"},
                },
                {
                    "type": "map",
                    "settings": {"exprs": {"window_start_ms": "unix_millis(CAST(window_start AS TIMESTAMP))"}},
                },
                {"type": "select", "settings": {"columns": ["window_start_ms", "result"]}},
            ],
        }
    )
    return pipe.run(spark, sf_dir)


# --------------------------------------------------------------------------
# A9: stream-stream join within a time bound — purchases joined to the
# clicks that preceded them by ≤1h for the same user


@register(
    "stream_join_time",
    oracle=f"""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           epoch_ms(p.ts) AS purchase_ts_ms, epoch_ms(c.ts) AS click_ts_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND epoch_ms(p.ts) - epoch_ms(c.ts) <= {_HOUR}
    """,
)
def stream_join_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on user_id with a time-range residual — shuffles both
    sides on the key once; the range predicate is evaluated post-join
    (no cartesian), which is the scalable stream-stream join shape."""
    pipe = Pipeline.from_dict(
        {
            "name": "purchase_attribution",
            "source": {"table": "events"},
            "stages": [
                {"type": "filter", "settings": {"type": "threshold", "column": "event_type", "value": "purchase", "op": "=="}},
                {
                    "type": "join",
                    "settings": {
                        "pipeline": {
                            "name": "clicks",
                            "source": {"table": "events"},
                            "stages": [
                                {"type": "filter", "settings": {"type": "threshold", "column": "event_type", "value": "click", "op": "=="}},
                            ],
                        },
                        "on": (
                            "l.user_id = r.user_id AND r.ts <= l.ts "
                            f"AND unix_millis(CAST(l.ts AS TIMESTAMP)) - unix_millis(CAST(r.ts AS TIMESTAMP)) <= {_HOUR}"
                        ),
                    },
                },
            ],
        }
    )
    return pipe.run(spark, sf_dir).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.unix_millis(F.col("l.ts").cast("timestamp")).alias("purchase_ts_ms"),
        F.unix_millis(F.col("r.ts").cast("timestamp")).alias("click_ts_ms"),
    )


# --------------------------------------------------------------------------
# A7+: a flogo app resource run as-is — the stream resource below is
# examples/agg-flogo.json's `stream:simple_agg` with only the window
# size changed (5000 ms → 1 h, so sf0.001's sparse events still form
# multi-row windows); stage refs, settings (string-typed windowSize,
# as flogo writes it), input/output mappings, and metadata are
# unchanged. The trigger's action-input binding (`=$.pathParams.val`)
# becomes the input_map below, reading the events table.

_FLOGO_SIMPLE_AGG = {
    "id": "stream:simple_agg",
    "data": {
        "metadata": {
            "input": [{"name": "input", "type": "int"}],
            "output": [{"name": "result", "type": "int"}],
        },
        "stages": [
            {
                "ref": "#aggregate",
                "settings": {
                    "function": "sum",
                    "windowType": "timeTumbling",
                    "windowSize": str(_HOUR),
                },
                "input": {"value": "=$.input"},
            },
            {"ref": "#log", "input": {"message": "=$.result"}},
        ],
    },
}


@register(
    "pipeline_flogo_resource",
    oracle=f"""
    SELECT {_DSUM} AS result
    FROM events GROUP BY epoch_ms(ts) // {_HOUR}
    """,
)
def pipeline_flogo_resource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the reference's example app resource through the DSL:
    per-stage input/output mappers (pipeline/stage.go:124-146) compile
    to Catalyst exprs; metadata.output is the final projection."""
    pipe = Pipeline.from_flogo_resource(
        {"resources": [_FLOGO_SIMPLE_AGG]},
        source={"table": "events"},
        input_map={"input": "=$.value"},
        resource_id="stream:simple_agg",
    )
    return pipe.run(spark, sf_dir)


_FLOGO_CHANNEL_APP = {
    "name": "stream",
    "channels": ["test:5"],
    "triggers": [
        {"id": "rest", "ref": "#rest", "handlers": [
            {"settings": {}, "action": {"id": "a_filter", "input": {"input": "=$.pathParams.val"}}}]},
        {"id": "chan", "ref": "#channel", "handlers": [
            {"settings": {"channel": "test"}, "action": {"id": "a_report", "input": {"rinput": "=$.data.out"}}}]},
    ],
    "actions": [
        {"id": "a_filter", "ref": "#stream",
         "settings": {"streamURI": "res://stream:f", "outputChannel": "test"}},
        {"id": "a_report", "ref": "#stream", "settings": {"streamURI": "res://stream:r"}},
    ],
    "resources": [
        {"id": "stream:f", "data": {
            "metadata": {"output": [{"name": "event_id", "type": "long"},
                                    {"name": "out", "type": "double"}]},
            "stages": [
                {"ref": "#filter", "settings": {"type": "non-zero"},
                 "input": {"value": "=$pipeline.input"},
                 "output": {"pipeline.out": "=$.value"}},
            ]}},
        {"id": "stream:r", "data": {
            "metadata": {"output": [{"name": "event_id", "type": "long"},
                                    {"name": "out", "type": "double"},
                                    {"name": "message", "type": "string"}]},
            "stages": [
                {"ref": "#log",
                 "input": {"message": "=string.concat('fromChannel: ', $pipeline.event_id)"}},
            ]}},
    ],
}


@register(
    "pipeline_flogo_channel_app",
    oracle="""
    SELECT event_id, value AS out,
           'fromChannel: ' || CAST(event_id AS VARCHAR) AS message
    FROM events WHERE value <> 0
    """,
)
def pipeline_flogo_channel_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full flogo app with an intra-app channel handoff
    (examples/channel-flogo.json shape) composed into one plan:
    external trigger → filter resource → channel mapping → report
    resource, with real flogo scope syntax ($pipeline.attr,
    pipeline.out, string.concat)."""
    pipe = Pipeline.from_flogo_app(
        _FLOGO_CHANNEL_APP, source={"table": "events"}, input_map={"input": "=$.value"}
    )
    return pipe.run(spark, sf_dir)


@register(
    "pipeline_dedup_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS ck
        FROM documents
    ),
    keep AS (SELECT ck, MIN(doc_id) AS doc_id FROM keyed GROUP BY ck)
    SELECT k.doc_id, k.lang
    FROM keyed k JOIN keep USING (ck, doc_id)
    WHERE CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 5000
    """,
)
def pipeline_dedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data pipeline in JSON: exact dedup (deterministic
    min-id keeper) → reproducible 50% sample → projection, all
    declared as DSL stages."""
    pipe = Pipeline.from_dict(
        {
            "name": "prep",
            "source": {"table": "documents"},
            "stages": [
                {"type": "dedup", "settings": {"column": "text", "id": "doc_id"}},
                {"type": "sample", "settings": {"rate": 0.5, "id": "doc_id"}},
                {"type": "select", "settings": {"columns": ["doc_id", "lang"]}},
            ],
        }
    )
    return pipe.run(spark, sf_dir)


# --------------------------------------------------------------------------
# Curation pipeline: langid -> quality gate -> dedup -> sample, all DSL

from stream_spark.operators.text import STOPWORDS as _LID_STOP  # noqa: E402
from stream_spark.queries.text_queries import TOKS as _P_TOKS, _STOP_IN as _P_STOP  # noqa: E402


def curation_gate_ctes(keep: tuple[str, ...] | None = ("en", "fr"), min_stop_hits: int = 2) -> str:
    """CTE chain replaying the langid (keep-set filter; None = all) +
    Gopher gate stages — shared by the batch and streaming curation
    oracles. Ends with ``gated(doc_id, text, predicted_lang)``."""
    hit_cols = ",\n               ".join(
        f"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"w -> w IN ({', '.join(repr(w) for w in words)}))) AS BIGINT) AS hits_{lang}"
        for lang, words in _LID_STOP.items()
    )
    pred = "'unknown'"
    hits = "0"
    for lang in _LID_STOP:  # fixed order + strict > = the operator's tie-break
        pred = f"CASE WHEN hits_{lang} > ({hits}) THEN '{lang}' ELSE ({pred}) END"
        hits = f"CASE WHEN hits_{lang} > ({hits}) THEN hits_{lang} ELSE ({hits}) END"
    return f"""lid AS (
        SELECT doc_id, text,
               {hit_cols}
        FROM documents
    ),
    lpred AS (SELECT doc_id, text, {pred} AS predicted_lang FROM lid),
    en AS (SELECT doc_id, text, predicted_lang FROM lpred
           {"WHERE predicted_lang IN (" + ", ".join(repr(k) for k in keep) + ")" if keep else ""}),
    feat AS (SELECT doc_id, text, predicted_lang, {_P_TOKS} AS ws FROM en),
    gated AS (
        SELECT doc_id, text, predicted_lang FROM feat
        WHERE len(ws) BETWEEN 20 AND 100000
          AND list_aggregate(list_transform(ws, w -> length(w)), 'sum') / len(ws)
              BETWEEN 3.0 AND 10.0
          AND len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) / len(ws) >= 0.8
          AND len(list_filter(ws, w -> w IN ({_P_STOP}))) >= {min_stop_hits}
    )"""


def _curation_oracle() -> str:
    return f"""
    WITH {curation_gate_ctes()},
    keyed AS (
        SELECT doc_id, predicted_lang,
               CAST(('0x' || substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS ck
        FROM gated
    ),
    keep AS (SELECT ck, MIN(doc_id) AS doc_id FROM keyed GROUP BY ck)
    SELECT k.doc_id, k.predicted_lang
    FROM keyed k JOIN keep USING (ck, doc_id)
    WHERE CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 8000
    """


@register("pipeline_curation", oracle=_curation_oracle())
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation recipe as DECLARATIVE JSON — language
    gate (stopword-hit langid, keep en/fr) → Gopher quality gate
    (relaxed word floor for the short test docs) → exact dedup →
    reproducible 80% sample → projection. One composed Catalyst plan
    from five DSL stages; the oracle replays every stage in SQL."""
    pipe = Pipeline.from_dict(
        {
            "name": "curation",
            "source": {"table": "documents"},
            "stages": [
                {"type": "langid", "settings": {"column": "text", "keep": ["en", "fr"]}},
                {"type": "quality_gate", "settings": {"column": "text", "minWords": 20}},
                {"type": "dedup", "settings": {"column": "text", "id": "doc_id"}},
                {"type": "sample", "settings": {"rate": 0.8, "id": "doc_id"}},
                {"type": "select", "settings": {"columns": ["doc_id", "predicted_lang"]}},
            ],
        }
    )
    return pipe.run(spark, sf_dir)


# --------------------------------------------------------------------------
# Multimodal curation capstone (r9, SURVEY §2 C92): the composition a
# 100 TB multimodal crawl actually runs, as ONE declarative pipeline.


def mm_gate_ctes(src: str = "documents") -> str:
    """The bare Gopher gate (minWords 20, paper defaults — no langid)
    over ``src``, ending with ``gate0(doc_id, text)`` — shared by the
    batch multimodal-curation oracle (C92) and its streaming twin."""
    return f"""feat AS (SELECT doc_id, text, {_P_TOKS} AS ws FROM {src}),
    gate0 AS (
        SELECT doc_id, text FROM feat
        WHERE len(ws) BETWEEN 20 AND 100000
          AND list_aggregate(list_transform(ws, w -> length(w)), 'sum') / len(ws)
              BETWEEN 3.0 AND 10.0
          AND len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) / len(ws) >= 0.8
          AND len(list_filter(ws, w -> w IN ({_P_STOP}))) >= 2
    )"""


#: the profiled generators' closed-form hash replay (see
#: operators/multimodal.synthetic_profiled_*: hash = md5_long(salt‖src)
#: % 2^49, or 2^49−1 when that is 0; src plants the dup pairs)
_MM_MD5_60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_MM_TWO49 = 1 << 49
_MM_ISRC = "CAST(CASE WHEN doc_id % 10 = 0 THEN doc_id + 3 ELSE doc_id END AS VARCHAR)"
_MM_ASRC = "CAST(CASE WHEN doc_id % 7 = 0 THEN doc_id + 2 ELSE doc_id END AS VARCHAR)"
_MM_IP = _MM_MD5_60.format(x=f"'i' || {_MM_ISRC}") + f" % {_MM_TWO49}"
_MM_AP = _MM_MD5_60.format(x=f"'a' || {_MM_ASRC}") + f" % {_MM_TWO49}"
MM_IMAGE_HASH = f"CASE WHEN {_MM_IP} = 0 THEN {_MM_TWO49 - 1} ELSE {_MM_IP} END"
MM_AUDIO_HASH = f"CASE WHEN {_MM_AP} = 0 THEN {_MM_TWO49 - 1} ELSE {_MM_AP} END"


def _mm_curation_oracle() -> str:
    """Replays every stage in SQL: Gopher gate → image aHash group
    dedup → audio fingerprint group dedup → banded text near-dup →
    1024-token packing. The banded CTE chain is the SAME
    src-parameterized fragment the standalone C85 queries gate; the
    media hashes are replayed via the profiled generators' closed form
    (operators/multimodal.synthetic_profiled_*: aHash over a payload
    whose 49-cell brightness/loudness pattern is md5-derived recovers
    the pattern EXACTLY — hash = md5_long(salt‖src) % 2^49, or 2^49−1
    when that is 0; src plants the ~10%/~14% dup pairs). The Spark side
    runs the REAL decode→hash path; the oracle computes the expected
    result independently — pinned bit-for-bit in
    tests/test_multimodal.py."""
    from stream_spark.queries.dedup_queries import _banded_edges_ctes

    return f"""
    WITH {mm_gate_ctes()},
    ihash AS (SELECT doc_id, {MM_IMAGE_HASH} AS image_hash FROM gate0),
    ikeep AS (SELECT image_hash, MIN(doc_id) AS doc_id FROM ihash GROUP BY image_hash),
    img_kept AS (SELECT g0.* FROM gate0 g0 JOIN ikeep USING (doc_id)),
    ahash0 AS (SELECT doc_id, {MM_AUDIO_HASH} AS audio_hash FROM img_kept),
    akeep AS (SELECT audio_hash, MIN(doc_id) AS doc_id FROM ahash0 GROUP BY audio_hash),
    aud_kept AS (SELECT i.* FROM img_kept i JOIN akeep USING (doc_id)),
    {_banded_edges_ctes("aud_kept")},
    dup AS (SELECT DISTINCT doc_b FROM verified),
    final_kept AS (SELECT * FROM aud_kept WHERE doc_id NOT IN (SELECT doc_b FROM dup)),
    pt AS (SELECT doc_id, CAST(len({_P_TOKS}) AS BIGINT) AS n_tokens FROM final_kept),
    pc AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS s0,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM pt
    )
    SELECT doc_id, n_tokens,
           CAST(s0 AS BIGINT) AS start_offset,
           CAST(s0 // 1024 AS BIGINT) AS pack_id,
           CAST((cum - 1) // 1024 - s0 // 1024 + 1 AS BIGINT) AS n_packs_spanned
    FROM pc
    """


@register("pipeline_multimodal_curation", oracle=_mm_curation_oracle())
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal-crawl curation recipe as ONE declarative JSON
    pipeline (r9, VERDICT r8 item 8): quality gate → image perceptual
    hash + hash-group dedup → audio fingerprint + hash-group dedup →
    text banded near-dup removal → fixed-budget sequence packing. All
    stages the engine already gates individually (C51 image aHash, C91
    audio fingerprint, C85 banded Jaccard, C16 packing), composed the
    way a production ingest runs them: cheapest gate first, then
    per-modality exact-collision dedup (linear hash groupBys), the
    candidate-bounded text pass last, packing over the survivors.

    Scale: every stage is keyed — no all-pairs step anywhere (media
    dedup works at the 2^16-bounded hash-group level; text pairs come
    from the band index); packing is the two-pass partition-offset
    prefix sum. The media hashes run in the same Arrow mapInPandas
    slot a real binaryFile + codec ingest occupies (synthetic
    deterministic payloads here — the oracle recomputes every hash
    arithmetically, same discipline as the standalone C51/C91 gates).
    """
    pipe = Pipeline.from_dict(
        {
            "name": "multimodal_curation",
            "source": {"table": "documents"},
            "stages": [
                {"type": "quality_gate", "settings": {"column": "text", "minWords": 20}},
                {"type": "media_hash", "settings": {"modality": "image", "id": "doc_id"}},
                {"type": "dedup_by", "settings": {"column": "image_hash", "id": "doc_id"}},
                {"type": "media_hash", "settings": {"modality": "audio", "id": "doc_id"}},
                {"type": "dedup_by", "settings": {"column": "audio_hash", "id": "doc_id"}},
                {
                    "type": "near_dedup",
                    "settings": {"column": "text", "id": "doc_id", "threshold": 0.8},
                },
                {
                    "type": "pack",
                    "settings": {"column": "text", "id": "doc_id", "budget": 1024},
                },
            ],
        }
    )
    return pipe.run(spark, sf_dir)


@register(
    "pipeline_media_hash_binary",
    oracle=f"""
    WITH ihash AS (SELECT doc_id, {MM_IMAGE_HASH} AS image_hash FROM documents),
    ikeep AS (SELECT image_hash, MIN(doc_id) AS doc_id FROM ihash GROUP BY image_hash),
    img_kept AS (SELECT i.doc_id, i.image_hash FROM ihash i JOIN ikeep k ON i.doc_id = k.doc_id),
    ahash0 AS (SELECT doc_id, image_hash, {MM_AUDIO_HASH} AS audio_hash FROM img_kept),
    akeep AS (SELECT audio_hash, MIN(doc_id) AS doc_id FROM ahash0 GROUP BY audio_hash)
    SELECT a.doc_id, a.image_hash, a.audio_hash
    FROM ahash0 a JOIN akeep k ON a.doc_id = k.doc_id
    """,
)
def pipeline_media_hash_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media_hash stage consuming REAL BYTES end to end (r10,
    VERDICT r9 item 7): the profiled PPM/WAV corpora are exported
    one-file-per-row from the executors, then the DSL pipeline's
    ``media_hash`` stages run in ``source: binary`` mode — a
    binaryFile scan (ids from file names), native decode → aHash in
    the same Arrow slot the synthetic path uses — followed by the
    hash-group keeps. No generator in the query path: the hash column
    comes off bytes read from disk, exactly the production ingest
    (compressed formats still raise the clean PIL install hint). The
    oracle replays both 49-bit closed forms and both group-min keeps;
    matching proves the export → binaryFile → decode → hash chain is
    lossless.

    Scale: the export is the test harness standing in for an existing
    object-store corpus; the scan path, Arrow batching and keyed
    join-back are what production runs (binaryFile prunes on
    path/length, content loads lazily per matched file)."""
    from stream_spark.operators import multimodal as mm
    from stream_spark.queries.dedup_queries import _index_staging_dir
    from stream_spark.sources import load_table, write_binary_files

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    img_dir = _index_staging_dir("media_bin_img")
    aud_dir = _index_staging_dir("media_bin_aud")
    write_binary_files(mm.synthetic_profiled_image_table(docs), img_dir, ext="ppm")
    write_binary_files(mm.synthetic_profiled_audio_table(docs), aud_dir, ext="wav")

    pipe = Pipeline.from_dict(
        {
            "name": "media_hash_binary",
            "source": {"table": "documents"},
            "stages": [
                {
                    "type": "media_hash",
                    "settings": {
                        "modality": "image",
                        "id": "doc_id",
                        "source": "binary",
                        "path": img_dir,
                        "glob": "*.ppm",
                    },
                },
                {"type": "dedup_by", "settings": {"column": "image_hash", "id": "doc_id"}},
                {
                    "type": "media_hash",
                    "settings": {
                        "modality": "audio",
                        "id": "doc_id",
                        "source": "binary",
                        "path": aud_dir,
                        "glob": "*.wav",
                    },
                },
                {"type": "dedup_by", "settings": {"column": "audio_hash", "id": "doc_id"}},
                {
                    "type": "select",
                    "settings": {"columns": ["doc_id", "image_hash", "audio_hash"]},
                },
            ],
        }
    )
    return pipe.run(spark, sf_dir)
