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
