"""Regression tests for bench.py's compact emitter (VERDICT r4 item 1).

Round 4's driver capture was rc=0 but parsed=null: the full-record stdout
line had grown to ~6.2 KB while the driver parses only the LAST 2000
characters. These tests pin the fix: the stdout line is a compact,
self-trimming summary hard-capped at 1800 chars, always json-parseable,
with budget-skipped blocks carried forward from the newest local artifact
with explicit provenance. Pure-host tests — no TPU, no jax compute.
"""
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def r4_record():
    with open(os.path.join(REPO, "artifacts", "bench_r4_local.json")) as f:
        return json.load(f)


def test_compact_fits_cap_on_full_record(bench, r4_record):
    """The fattest real record we have (r4: 6.2 KB serialized — the exact
    line that broke the round-4 driver capture) must compact under the cap
    and still carry every VERDICT-required row."""
    em = bench.Emitter()
    em.detail.update(r4_record["detail"])
    em.metric = r4_record["metric"]
    em.value = r4_record["value"]
    em.unit = r4_record["unit"]
    em.vs_baseline = r4_record["vs_baseline"]
    em.partial = False
    line = em.compact(set())
    assert len(line) <= bench.COMPACT_MAX_CHARS
    d = json.loads(line)  # must be one parseable JSON object
    assert d["metric"] == r4_record["metric"]
    assert d["value"] == r4_record["value"]
    # the rows VERDICT r3/r4 require in the driver record
    cd = d["detail"]
    assert "fom_pallas_b4096" in cd and "rom_nn" in cd
    assert cd["headline"]["rhat_split_max"] is not None
    assert "res8" in cd.get("res", {}) and "res16" in cd.get("res", {})
    assert cd["full_record"] == "artifacts/bench_full_latest.json"


def test_carry_forward_fills_skipped_blocks(bench):
    """A budget-starved run (only build + headline done) must still record
    every layer, tagged with carry provenance."""
    em = bench.Emitter()
    assert em.carry_detail, "carry source artifact missing"
    em.detail["blocks"] = {
        k: {"skipped": "budget", "est_s": 1} for k in bench.BLOCK_DETAIL_KEYS
    }
    em.detail["blocks"]["build_pipeline"] = {"seconds": 20.0}
    carried = em._apply_carries()
    # dict-valued carried rows carry an explicit source tag
    assert em.detail["pcn_single_temp"]["source"].startswith("carry:")
    assert em.detail["laplace_mh"]["source"].startswith("carry:")
    # scalar rows (fom rates) are carried too
    assert em.detail["fom_solves_per_sec_pallas_b4096"] is not None
    line = em.compact(carried)
    assert len(line) <= bench.COMPACT_MAX_CHARS
    d = json.loads(line)
    assert d["detail"]["blocks"]["laplace_mh"] == "carry"
    assert d["detail"]["carry"]["src"] == os.path.basename(bench.CARRY_SRC)
    # carries are idempotent across emits (cumulative set, no regressions)
    carried2 = em._apply_carries()
    assert carried2 == carried
    d2 = json.loads(em.compact(carried2))
    assert d2["detail"]["blocks"]["laplace_mh"] == "carry"


def test_compact_trims_pathological_records(bench, r4_record):
    """Even a record bloated far past anything bench.py produces must trim
    to the cap and stay parseable (the last-resort path)."""
    em = bench.Emitter()
    em.detail.update(r4_record["detail"])
    # bloat: 40 fake resolution rows + a huge sampler string
    em.detail["resolution_scaling"] = {
        f"res{i}": {"fom_solves_per_sec_pallas": 123.456 + i} for i in range(40)
    }
    em.detail["sampler"] = "x" * 3000
    em.detail["deployed_config"] = "y" * 3000
    line = em.compact(set())
    assert len(line) <= bench.COMPACT_MAX_CHARS
    json.loads(line)


def test_full_record_shape_matches_sync_contract(bench, r4_record):
    """sync_bench_docs.py reads the FULL record; its shape must be the
    classic {metric, value, unit, vs_baseline, detail} object."""
    em = bench.Emitter()
    em.detail.update(r4_record["detail"])
    em.value = 1.0
    full = em.full_record()
    assert set(full) >= {"metric", "value", "unit", "vs_baseline", "detail"}
    assert full["detail"]["pcn_single_temp"]["rhat_gate"] == 1.01


@pytest.fixture(scope="module")
def sync():
    spec = importlib.util.spec_from_file_location(
        "sync_under_test", os.path.join(REPO, "scripts", "sync_bench_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sync_survives_truncated_artifact(sync):
    """Advisor r4: an artifact whose fail-soft fom/rom_nn/headline blocks
    errored must sync with MISSING rows, not crash with KeyError."""
    art = {"metric": "x", "value": None, "unit": "u", "vs_baseline": None,
           "detail": {"blocks": {},
                      "pcn_single_temp": {"error": "boom"},
                      "da_fom_exact": {"error": "boom"}}}
    r = sync.readme_block(art, "artifacts/bench_r4_local.json")
    b = sync.baseline_block(art, "artifacts/bench_r4_local.json")
    assert sync.MISSING in r and sync.MISSING in b


def test_sync_reports_gate_verdict_and_carry(sync, r4_record):
    """Advisor r4: the single-temp row must spell out its gate verdict, and
    carried rows must name their source artifact."""
    import copy

    art = copy.deepcopy(r4_record)
    art["detail"]["laplace_mh"]["source"] = "carry:artifacts/bench_r4_local.json"
    r = sync.readme_block(art, "artifacts/bench_r4_local.json")
    assert "ABOVE its 1.01 gate" in r  # r4's single-temp rhat 1.0233 missed
    assert "carried from" in r
    b = sync.baseline_block(art, "artifacts/bench_r4_local.json")
    assert "ABOVE its 1.01 gate" in b


def test_build_pipeline_bumps_iters_for_tight_noise():
    """Advisor r4: with the auto online_iters default and noise < 5e-4 the
    deployed iteration count must bump to 3r/4 (with a warning), not
    silently ship solver error above the noise floor. Traced at tiny sizes
    so this runs in seconds on CPU."""
    import dataclasses
    import warnings

    from bayesianinferencedl_tpu.api import build_pipeline
    from bayesianinferencedl_tpu.config import (
        MCMCConfig, MeshConfig, PipelineConfig, ROMConfig, SurrogateConfig,
    )

    cfg = PipelineConfig(
        mesh=MeshConfig(resolution=1),
        rom=ROMConfig(n_snapshots=8, basis_size=8),
        surrogate=SurrogateConfig(n_train=16, epochs=2),
        mcmc=MCMCConfig(noise_sigma=1e-4),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe = build_pipeline(cfg)
    assert pipe.rom_pcg_iters == max(max(15, 8 // 2), 3 * 8 // 4)
    assert any("online_iters" in str(x.message) for x in w)
    # explicit online_iters overrides the bump
    cfg2 = dataclasses.replace(cfg, rom=ROMConfig(n_snapshots=8, basis_size=8, online_iters=5))
    assert build_pipeline(cfg2).rom_pcg_iters == 5
