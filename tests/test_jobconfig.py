"""Declarative job-config composer tests: the reference's JSON/YAML job
shape (reader -> transformer chain -> writer + setting errorLimit/speed)
runs end-to-end; dirty rows are quarantined WITH reasons and the error
budget fails the job past the limit (ErrorRecordChecker record priority);
preSql truncate + postSql probe; dx_filter null-literal semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from addax_spark.jobconfig import job_from_config, load_config, run_job
from addax_spark.operators.transforms import dx_filter


def _csv_job(src, out, error_record_limit=10):
    return {
        "job": {
            "setting": {
                "speed": {"byte": -1, "channel": 1},
                "errorLimit": {"record": error_record_limit, "percentage": 0.5},
            },
            "content": {
                "reader": {
                    "name": "txtfilereader",
                    "parameter": {
                        "path": src,
                        "fieldDelimiter": ",",
                        "nullFormat": "\\N",
                        "column": [
                            {"index": 0, "type": "long", "name": "id"},
                            {"index": 1, "type": "string", "name": "name"},
                            {"index": 2, "type": "double", "name": "score"},
                        ],
                    },
                },
                "transformer": [
                    {"name": "dx_substr", "parameter": {"columnIndex": 1, "paras": ["0", "3"]}},
                    {"name": "dx_filter", "parameter": {"columnIndex": 0, "paras": [">", "90"]}},
                ],
                "writer": {
                    "name": "hdfswriter",
                    "parameter": {
                        "path": out,
                        "fileType": "parquet",
                        "writeMode": "truncate",
                        "preSql": ["truncate table @table"],
                        "postSql": ["select 1"],
                    },
                },
            },
        }
    }


def test_csv_to_parquet_job(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("1,alice,2.5\n2,bobby,3.5\n95,zed,9.9\nbad,eve,1.0\n4,carl,oops\n")
    out = str(tmp_path / "out")
    m = run_job(spark, _csv_job(str(src), out))
    assert m["rows_read"] == 5
    assert m["dirty_records"] == 2  # "bad" id and "oops" score
    assert m["rows_written"] == 2  # id=95 dropped by dx_filter(>90)
    got = {r.id: (r.name, r.score) for r in spark.read.parquet(out).collect()}
    assert got == {1: ("ali", 2.5), 2: ("bob", 3.5)}
    # dirty lineage persisted as a SIBLING with reasons
    errs = spark.read.json(out + "_errors")
    reasons = {r._error_reason for r in errs.collect()}
    assert any("id !~ long: 'bad'" in r for r in reasons)
    assert any("score !~ double: 'oops'" in r for r in reasons)


def test_error_budget_enforced_after_persist(spark, tmp_path):
    src = tmp_path / "in2.csv"
    src.write_text("1,a,1.0\nx,b,2.0\ny,c,3.0\n")
    out = str(tmp_path / "out2")
    with pytest.raises(RuntimeError, match="limit exceeded"):
        run_job(spark, _csv_job(str(src), out, error_record_limit=1))
    # reference semantics: budget checked POST-run -> dirty rows + output exist
    assert spark.read.json(out + "_errors").count() == 2
    assert spark.read.parquet(out).count() == 1


def test_streamreader_transformer_demo_shape(spark, tmp_path):
    """The reference's transformer_demo.json shape (streamreader constants +
    random column, dx_replace/dx_substr/dx_map(^)/dx_filter chain)."""
    cfg = {
        "job": {
            "setting": {"speed": {"channel": 1}},
            "content": {
                "reader": {
                    "name": "streamreader",
                    "parameter": {
                        "column": [
                            {"value": "My name is xxxx", "type": "string"},
                            {"value": "19", "type": "string"},
                            {"random": "0,10", "type": "long"},
                        ],
                        "sliceRecordCount": 10,
                    },
                },
                "transformer": [
                    {"name": "dx_replace", "parameter": {"columnIndex": 0, "paras": ["11", "4", "wgzhao"]}},
                    {"name": "dx_map", "parameter": {"columnIndex": 1, "paras": ["^", "2"]}},
                    {"name": "dx_filter", "parameter": {"columnIndex": 2, "paras": ["<", "5"]}},
                ],
                "writer": {"name": "streamwriter", "parameter": {"print": False}},
            },
        }
    }
    m = run_job(spark, cfg)
    assert m["rows_read"] == 10
    assert 0 < m["rows_written"] <= 10  # deterministic: same every run
    again = run_job(spark, cfg)
    assert again["rows_written"] == m["rows_written"]


def test_yaml_config_roundtrip(tmp_path):
    import yaml

    cfg = _csv_job("/x/in.csv", "/x/out")
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    j = job_from_config(load_config(str(p)))
    assert j.reader_name == "txtfilereader"
    assert [t.name for t in j.transforms] == ["dx_substr", "dx_filter"]
    assert j.error_limit_records == 10 and j.channel == 1
    jp = tmp_path / "job.json"
    jp.write_text(json.dumps(cfg))
    assert job_from_config(load_config(str(jp))).writer_name == "hdfswriter"


def test_dx_filter_null_literal_semantics(spark):
    """FilterTransformer null branches: '=' 'null' drops nulls; '!=' other
    drops nulls; '>' keeps nulls; 'not like' drops nulls."""
    df = spark.createDataFrame(
        [("a",), (None,), ("null",), ("b",)], "v string"
    )
    keep = lambda op, val: sorted(  # noqa: E731
        r.v or "<null>" for r in dx_filter(df, "v", op, val).collect()
    )
    assert keep("=", "null") == ["a", "b"]  # null AND literal 'null' dropped
    assert keep("=", "a") == ["<null>", "b", "null"]
    assert keep("!=", "null") == ["<null>", "null"]  # kept: null field + 'null'
    assert keep("!=", "a") == ["a"]  # nulls dropped on != other
    assert keep(">", "a") == ["<null>", "a"]  # nulls skip comparison
    assert keep("like", "a.*") == ["<null>", "b", "null"]
    assert keep("not like", "a.*") == ["a"]  # nulls dropped on not-like


def test_pre_check_dry_run(spark, tmp_path):
    """preCheck twin (JobContainer.java:191-269): validates reader schema,
    transformer resolution and writer dispatch on a LIMIT 0 plan — no data
    moved, no output written."""
    import os

    from addax_spark.jobconfig import pre_check

    src = tmp_path / "pc.csv"
    src.write_text("1,alice,2.5\n")
    out = str(tmp_path / "pc_out")
    res = pre_check(spark, _csv_job(str(src), out))
    assert res["ok"] and res["columns"] == ["id", "name", "score"]
    assert res["dirty_cast_columns"] == ["id", "score"]
    assert not os.path.exists(out)  # nothing written
    bad = _csv_job(str(src), out)
    bad["job"]["content"]["writer"]["name"] = "nosuchwriter"
    with pytest.raises(ValueError, match="unsupported writer"):
        pre_check(spark, bad)


def test_job_lifecycle_hooks(spark, tmp_path):
    """preHandle/postHandle twins on the rollup job driver."""
    from addax_spark import synth
    from addax_spark.job import RollupJobSpec, run

    raw = str(tmp_path / "hooks_in.parquet")
    synth.transcripts(spark, n_convs=5, avg_turns=5).write.parquet(raw)
    calls = []
    spec = RollupJobSpec(
        raw, str(tmp_path / "hooks_out"), job_id="hooks", tiers=["1m"],
        pre_hook=lambda sp, s: calls.append(("pre", s.job_id)),
        post_hook=lambda sp, s, summary: calls.append(("post", summary["units"])),
    )
    res = run(spark, spec)
    assert calls[0] == ("pre", "hooks")
    assert calls[1] == ("post", res["units"])
