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
