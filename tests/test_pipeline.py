from __future__ import annotations

import pytest

from stream_spark.pipeline import Pipeline


def test_filter_then_aggregate(spark, sf_dir):
    pipe = Pipeline.from_json(
        """
        {"name": "p", "source": {"table": "events"}, "stages": [
            {"type": "map", "settings": {"exprs": {"vf": "floor(value)"}}},
            {"type": "filter", "settings": {"type": "non-zero", "column": "vf"}},
            {"type": "aggregate", "settings": {
                "function": "count", "windowType": "timeTumbling",
                "windowSize": 86400000, "value": "value"}}
        ]}
        """
    )
    out = pipe.run(spark, sf_dir)
    assert set(out.columns) == {"window_start", "result"}
    assert out.count() > 0


def test_union_stage(spark, sf_dir):
    cfg = {
        "name": "u",
        "source": {"table": "events"},
        "stages": [
            {"type": "select", "settings": {"columns": ["event_id"]}},
            {
                "type": "union",
                "settings": {
                    "pipeline": {
                        "source": {"table": "events"},
                        "stages": [{"type": "select", "settings": {"columns": ["event_id"]}}],
                    }
                },
            },
        ],
    }
    n = Pipeline.from_dict(cfg).run(spark, sf_dir).count()
    assert n == 2000  # sf0.001 events ×2


def test_bad_stage_type_rejected():
    with pytest.raises(ValueError, match="unsupported stage"):
        Pipeline.from_dict({"source": {"table": "events"}, "stages": [{"type": "nope"}]})


def test_reference_settings_schema(spark, sf_dir):
    """The reference's aggregate settings (windowType/windowSize/
    additionalSettings nameKey+valueKey, proceedOnlyOnEmit) work
    verbatim in the DSL."""
    pipe = Pipeline.from_dict(
        {
            "name": "flogo_style",
            "source": {"table": "events"},
            "stages": [
                {
                    "type": "aggregate",
                    "settings": {
                        "function": "sum",
                        "windowType": "tumbling",
                        "windowSize": 50,
                        "proceedOnlyOnEmit": True,
                        "additionalSettings": {"nameKey": "event_type", "valueKey": "value"},
                    },
                }
            ],
        }
    )
    out = pipe.run(spark, sf_dir)
    assert set(out.columns) == {"event_type", "window_id", "result"}
    assert out.count() > 0


def test_mapping_expressions(spark, sf_dir):
    """flogo `=$.attr` input/output mappings compile to Catalyst
    exprs and run before/after the stage body."""
    pipe = Pipeline.from_dict(
        {
            "name": "mapped",
            "source": {"table": "events"},
            "stages": [
                {
                    "ref": "#aggregate",
                    "settings": {"function": "sum", "windowType": "timeTumbling", "windowSize": "86400000"},
                    "input": {"value": "=$.value * 2"},
                    "output": {"doubled": "=$.result", "tag": "daily"},
                },
            ],
        }
    )
    out = pipe.run(spark, sf_dir)
    assert {"window_start", "result", "doubled", "tag"} <= set(out.columns)
    row = out.limit(1).collect()[0]
    assert row["doubled"] == row["result"]
    assert row["tag"] == "daily"


def test_from_flogo_resource(spark, sf_dir):
    """The examples/agg-flogo.json resource shape runs end to end:
    ref-style stages, string windowSize, mappings, metadata.output."""
    app = {
        "resources": [
            {
                "id": "stream:simple_agg",
                "data": {
                    "metadata": {
                        "input": [{"name": "input", "type": "int"}],
                        "output": [{"name": "result", "type": "int"}],
                    },
                    "stages": [
                        {
                            "ref": "#aggregate",
                            "settings": {"function": "sum", "windowType": "timeTumbling", "windowSize": "86400000"},
                            "input": {"value": "=$.input"},
                        },
                        {"ref": "#log", "input": {"message": "=$.result"}},
                    ],
                },
            }
        ]
    }
    pipe = Pipeline.from_flogo_resource(app, source={"table": "events"}, input_map={"input": "=$.value"})
    out = pipe.run(spark, sf_dir)
    assert out.columns == ["result"]  # metadata.output projection
    assert out.count() > 0


def test_from_flogo_app_channel_chain(spark, sf_dir):
    """examples/channel-flogo.json shape: an externally-triggered
    filter action hands off to a second action over an app channel;
    the composed plan runs both resources' stages with the channel
    handler's $.data.* input mapping between them, and real flogo
    scope syntax ($pipeline.attr, pipeline.out, string.concat)."""
    app = {
        "name": "stream",
        "channels": ["test:5"],
        "triggers": [
            {
                "id": "receive_http_message",
                "ref": "#rest",
                "handlers": [
                    {"settings": {"method": "GET"}, "action": {"id": "simple_filter", "input": {"input": "=$.pathParams.val"}}}
                ],
            },
            {
                "id": "internal_channel",
                "ref": "#channel",
                "handlers": [
                    {"settings": {"channel": "test"}, "action": {"id": "simple_report", "input": {"rinput": "=$.data.out"}}}
                ],
            },
        ],
        "actions": [
            {"id": "simple_filter", "ref": "#stream",
             "settings": {"streamURI": "res://stream:simple_filter", "outputChannel": "test"}},
            {"id": "simple_report", "ref": "#stream",
             "settings": {"streamURI": "res://stream:simple_report"}},
        ],
        "resources": [
            {
                "id": "stream:simple_filter",
                "data": {
                    "metadata": {"input": [{"name": "input", "type": "int"}],
                                 "output": [{"name": "out", "type": "int"}]},
                    "stages": [
                        {"ref": "#filter", "settings": {"type": "non-zero"},
                         "input": {"value": "=$pipeline.input"},
                         "output": {"pipeline.out": "=$.value"}},
                        {"ref": "#log", "input": {"message": "=$.value"}},
                    ],
                },
            },
            {
                "id": "stream:simple_report",
                "data": {
                    "metadata": {"input": [{"name": "rinput", "type": "int"}]},
                    "stages": [
                        {"ref": "#log",
                         "input": {"message": "=string.concat('fromChannel: ', $pipeline.rinput)"}}
                    ],
                },
            },
        ],
    }
    pipe = Pipeline.from_flogo_app(app, source={"table": "events"}, input_map={"input": "=$.value"})
    out = pipe.run(spark, sf_dir)
    rows = out.limit(5).collect()
    assert rows
    # the filter resource declares out; the report stage's log message
    # carries the channel payload through string.concat
    assert "out" in out.columns and "message" in out.columns
    assert all(r["message"].startswith("fromChannel: ") for r in rows)
    assert all(r["out"] != 0 for r in rows)


def test_pipeline_telemetry_events(spark, sf_dir):
    """The four-hook TelemetryService (reference
    pipeline/support/telemetry.go) fires in order around stages."""
    from stream_spark.pipeline import TelemetryService, register_telemetry_service

    events = []

    class Recorder(TelemetryService):
        def pipeline_started(self, pid, iid, data):
            events.append(("pipeline-started", pid, None))

        def stage_started(self, pid, iid, sid, data):
            events.append(("stage-started", pid, sid))

        def stage_finished(self, pid, iid, sid, data):
            events.append(("stage-finished", pid, sid))
            assert "schema" in data

        def pipeline_finished(self, pid, iid, data):
            events.append(("pipeline-finished", pid, None))

    register_telemetry_service(Recorder())
    try:
        pipe = Pipeline.from_dict(
            {"name": "tele", "source": {"table": "events"},
             "stages": [{"type": "filter", "settings": {"type": "non-zero", "column": "value"}}]}
        )
        pipe.run(spark, sf_dir)
    finally:
        register_telemetry_service(None)
    kinds = [e[0] for e in events]
    assert kinds == ["pipeline-started", "stage-started", "stage-finished", "pipeline-finished"]
    assert events[1][2] == "0:filter"


def test_pipeline_sink_stage_roundtrip(spark, tmp_path):
    """A `sink` stage persists the frame mid-pipeline and passes it
    through; the written table matches what the pipeline returns."""
    from stream_spark.pipeline import Pipeline

    out = str(tmp_path / "sunk")
    pipe = Pipeline.from_dict(
        {
            "name": "sink_test",
            "source": {"table": "events"},
            "stages": [
                {"type": "filter", "settings": {"type": "non-zero", "column": "value"}},
                {"type": "select", "settings": {"columns": ["event_id", "user_id", "value"]}},
                {"type": "sink", "settings": {"path": out}},
            ],
        }
    )
    res = pipe.run(spark, "/root/testdata/sf0.001")
    back = spark.read.parquet(out)
    assert back.count() == res.count()
    assert set(back.columns) == {"event_id", "user_id", "value"}


def test_pipeline_sink_stage_zorder(spark, tmp_path):
    from stream_spark.pipeline import Pipeline

    out = str(tmp_path / "zsunk")
    pipe = Pipeline.from_dict(
        {
            "name": "zsink",
            "source": {"table": "events"},
            "stages": [
                {"type": "select", "settings": {"columns": ["event_id", "user_id", "value"]}},
                {"type": "sink", "settings": {"path": out, "zorder_by": ["user_id", "event_id"], "bits": 8, "n_files": 4}},
            ],
        }
    )
    res = pipe.run(spark, "/root/testdata/sf0.001")
    back = spark.read.parquet(out)
    assert back.count() == res.count()
    assert "_zkey" not in back.columns


# --------------------------------------------------------------------------
# remote pipeline provider (pipeline/manager.go BasicRemotePipelineProvider)

_PROVIDER_CFG = {
    "name": "remote_agg",
    "source": {"table": "events"},
    "stages": [
        {"type": "filter", "settings": {"type": "non-zero", "column": "value"}},
        {
            "type": "aggregate",
            "settings": {
                "function": "sum",
                "windowType": "timeTumbling",
                "windowSize": 3_600_000,
                "value": "value",
            },
        },
    ],
}


def test_from_uri_flogo_stream_inline(spark, sf_dir):
    from stream_spark.pipeline import Pipeline, encode_stream_uri

    uri = encode_stream_uri(_PROVIDER_CFG)
    assert uri.startswith("flogo-stream://")
    out = Pipeline.from_uri(uri, {"table": "events"}).run(spark, sf_dir)
    assert out.count() > 0 and "result" in out.columns


def test_from_uri_file_plain_and_gzipped(spark, sf_dir, tmp_path):
    import gzip
    import json

    from stream_spark.pipeline import Pipeline

    plain = tmp_path / "pipe.json"
    plain.write_text(json.dumps(_PROVIDER_CFG))
    p1 = Pipeline.from_uri(f"file://{plain}", {"table": "events"})
    gz = tmp_path / "pipe.json.gz"
    gz.write_bytes(gzip.compress(json.dumps(_PROVIDER_CFG).encode()))
    p2 = Pipeline.from_uri(f"file://{gz}", {"table": "events"})
    assert p1.run(spark, sf_dir).count() == p2.run(spark, sf_dir).count()


def test_from_uri_http_compressed_header(spark, sf_dir):
    import base64
    import gzip
    import json

    from stream_spark.pipeline import Pipeline

    body = base64.b64encode(gzip.compress(json.dumps(_PROVIDER_CFG).encode()))

    def fake_fetch(uri):
        assert uri == "http://pipelines.example/agg"
        return body, {"flogo-compressed": "true"}

    out = Pipeline.from_uri(
        "http://pipelines.example/agg", {"table": "events"}, fetch=fake_fetch
    ).run(spark, sf_dir)
    assert out.count() > 0


def test_from_uri_resource_and_bad_scheme(spark, sf_dir):
    from stream_spark.pipeline import Pipeline, encode_stream_uri

    # a bare stream-resource shape ({data: {stages}}) resolves too
    res_cfg = {
        "id": "stream:remote",
        "data": {"stages": _PROVIDER_CFG["stages"], "metadata": {}},
    }
    out = Pipeline.from_uri(encode_stream_uri(res_cfg), {"table": "events"}).run(spark, sf_dir)
    assert out.count() > 0
    with pytest.raises(ValueError, match="scheme"):
        Pipeline.from_uri("ftp://nope", {"table": "events"})


def test_quality_gate_and_langid_stages(spark, sf_dir):
    """The curation stage types: quality_gate drops failing docs and
    (default) leaves the schema unchanged; emit_flags keeps the rule
    columns; langid adds predicted_lang and keep filters to the set."""
    from stream_spark.pipeline import Pipeline

    base = Pipeline.from_dict(
        {"name": "p", "source": {"table": "documents"}, "stages": []}
    ).run(spark, sf_dir)

    gated = Pipeline.from_dict(
        {
            "name": "p",
            "source": {"table": "documents"},
            "stages": [{"type": "quality_gate", "settings": {"minWords": 20}}],
        }
    ).run(spark, sf_dir)
    assert gated.columns == base.columns           # flags dropped by default
    assert 0 < gated.count() < base.count()        # gate actually rejects

    flagged = Pipeline.from_dict(
        {
            "name": "p",
            "source": {"table": "documents"},
            "stages": [
                {"type": "quality_gate", "settings": {"minWords": 20, "emit_flags": True}}
            ],
        }
    ).run(spark, sf_dir)
    assert "gopher_keep" in flagged.columns and "rule_n_words" in flagged.columns
    assert flagged.filter("gopher_keep != 1").count() == 0

    lid = Pipeline.from_dict(
        {
            "name": "p",
            "source": {"table": "documents"},
            "stages": [{"type": "langid", "settings": {"keep": ["en"]}}],
        }
    ).run(spark, sf_dir)
    assert "predicted_lang" in lid.columns
    assert lid.filter("predicted_lang != 'en'").count() == 0
    assert lid.count() > 0


def test_media_and_dedup_stages(spark, sf_dir):
    """The r9 multimodal-curation stage types: media_hash attaches the
    perceptual hash column (profiled generator → planted id%10==0↔id+3
    image pairs collide); dedup_by keeps exactly the min-id row per
    hash group; near_dedup drops only doc_b-side near-dups; pack emits
    the packing assignment schema; unknown modality raises."""
    import pytest

    from stream_spark.pipeline import Pipeline

    def run(stages, src="documents"):
        return Pipeline.from_dict(
            {"name": "p", "source": {"table": src}, "stages": stages}
        ).run(spark, sf_dir)

    hashed = run([{"type": "media_hash", "settings": {"modality": "image"}}])
    assert "image_hash" in hashed.columns
    rows = {r["doc_id"]: r["image_hash"] for r in hashed.select("doc_id", "image_hash").collect()}
    planted = [(a, a + 3) for a in rows if a % 10 == 0 and a + 3 in rows]
    assert planted and all(rows[a] == rows[b] for a, b in planted)

    deduped = run(
        [
            {"type": "media_hash", "settings": {"modality": "image"}},
            {"type": "dedup_by", "settings": {"column": "image_hash", "id": "doc_id"}},
        ]
    )
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    # exactly one survivor per hash group, and it is the min id
    from collections import defaultdict

    groups = defaultdict(list)
    for did, h in rows.items():
        groups[h].append(did)
    assert kept == {min(v) for v in groups.values()}

    nd = run([{"type": "near_dedup", "settings": {"threshold": 0.8}}])
    base_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0 < nd.count() < base_n  # testdata plants text near-dups

    packed = run([{"type": "pack", "settings": {"budget": 64}}])
    assert set(packed.columns) == {
        "doc_id", "n_tokens", "start_offset", "pack_id", "n_packs_spanned"
    }
    assert packed.count() == base_n

    with pytest.raises(ValueError, match="modality"):
        run([{"type": "media_hash", "settings": {"modality": "video"}}]).count()


def test_dedup_by_on_stream_raises_with_pointer(spark, tmp_path):
    """The batch-only dedup_by stage fails FAST on a streaming frame
    with a pointer to the online first-seen path, instead of a deep
    Catalyst window-unsupported error."""
    import pytest as _pytest

    from stream_spark.pipeline import Pipeline

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "CAST(value AS STRING) AS h")
    )
    pipe = Pipeline.from_dict(
        {
            "name": "bad",
            "source": {"table": "documents"},
            "stages": [{"type": "dedup_by", "settings": {"column": "h", "id": "doc_id"}}],
        }
    )
    with _pytest.raises(ValueError, match="multi_hash_first_seen"):
        pipe.run_on(stream, spark)
