"""bench.py artifact contract (r8 verdict item 4 + r8 ADVICE #4), unit
level — no SparkSession: the write-path resolution that keeps the
driver's per-round run from dirtying the committed BENCH_local.json, and
the doc-merge shapes including the ONLY-mode audit trail that used to be
computed-but-dropped."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import resolve_out_path, update_doc

REPO_BENCH = "/root/repo/BENCH_local.json"


def test_driver_mode_writes_to_scratch():
    """No env opt-in (exactly the driver's invocation) -> /tmp scratch;
    the committed artifact is never the default target anymore."""
    out = resolve_out_path(REPO_BENCH, env={})
    assert out.startswith("/tmp/"), out
    assert out != REPO_BENCH


def test_builder_ritual_opts_into_repo_write():
    assert (
        resolve_out_path(REPO_BENCH, env={"SPARK_GRAFT_BENCH_WRITE": "1"})
        == REPO_BENCH
    )
    # explicit OUT wins over everything
    assert (
        resolve_out_path(
            REPO_BENCH,
            env={"SPARK_GRAFT_BENCH_WRITE": "1", "SPARK_GRAFT_BENCH_OUT": "/x.json"},
        )
        == "/x.json"
    )


def _run(doc, timings, restab, raws, **kw):
    defaults = dict(bench_all=False, only=False, sf=0.1, load=1.0)
    defaults.update(kw)
    total = round(sum(timings.values()), 3)
    return update_doc(dict(doc), dict(timings), list(restab), dict(raws),
                      total=total, **defaults)


def test_headline_lane_persists_raw_medians():
    doc = _run({}, {"q1": 1.0, "q2": 3.1}, ["q2"], {"q2": 4.8})
    assert doc["queries"] == {"q1": 1.0, "q2": 3.1}
    assert doc["restabilized"] == ["q2"]
    assert doc["restabilized_raw"] == {"q2": 4.8}, (
        "the pre-restabilization median must survive beside the kept min"
    )


def test_only_merge_writes_audit_trail_and_min_merges():
    committed = {"queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0}
    # re-measure q2: fresh median 3.5 restabilized down to 2.4 — still
    # above committed, so the merged map keeps 2.0, but the audit trail
    # records both fresh readings
    doc = _run(committed, {"q2": 2.4}, ["q2"], {"q2": 3.5}, only=True)
    assert doc["queries"]["q2"] == 2.0, "min-merge keeps the committed best"
    assert doc["value"] == 3.0
    assert doc["fresh_only"] == {"q2": 2.4}
    assert doc["restabilized_only"] == ["q2"]
    assert doc["restabilized_only_raw"] == {"q2": 3.5}
    # a second ONLY session merges, not overwrites
    doc2 = _run(doc, {"q1": 0.9}, [], {}, only=True)
    assert doc2["queries"] == {"q1": 0.9, "q2": 2.0}
    assert doc2["fresh_only"] == {"q2": 2.4, "q1": 0.9}
    assert doc2["restabilized_only"] == ["q2"]


def test_full_lane_supersedes_only_audit_trail():
    doc = {
        "fresh_only": {"q2": 2.4},
        "restabilized_only": ["q2"],
        "restabilized_only_raw": {"q2": 3.5},
    }
    out = _run(doc, {"q1": 1.0, "q2": 2.1}, [], {})
    for k in ("fresh_only", "restabilized_only", "restabilized_only_raw"):
        assert k not in out
    assert out["restabilized_raw"] == {}


def test_all_lane_keys_are_suffixed():
    out = _run({}, {"q1": 1.0}, ["q1"], {"q1": 2.0}, bench_all=True, sf=0.01)
    assert out["queries_all"] == {"q1": 1.0}
    assert out["restabilized_all_raw"] == {"q1": 2.0}
    out2 = _run(out, {"q1": 0.8}, [], {}, bench_all=True, only=True, sf=0.01)
    assert out2["queries_all"]["q1"] == 0.8
    assert out2["value_all"] == 0.8
    assert out2["fresh_only_all"] == {"q1": 0.8}
