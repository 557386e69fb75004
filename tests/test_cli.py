"""CLI smoke tests (subprocess, CPU) — the user-facing surface parses and the
fast config-ladder commands produce valid JSON."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",  # overridden by plugin; the flag below is what counts
    "BIDL_FORCE_CPU": "1",
}


def _run(args, timeout=600):
    # Force CPU inside the subprocess via a sitecustomize-style -c wrapper
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['cli']+%r;"
        "from bayesianinferencedl_tpu.cli import main; main()"
    ) % (args,)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=REPO, timeout=timeout, env=ENV,
    )
    return out


def test_cli_help():
    out = _run(["--help"])
    assert out.returncode == 0
    for cmd in ["fom", "snapshots", "rom", "surrogate", "invert", "map", "invert-ff"]:
        assert cmd in out.stdout


def test_cli_fom_json():
    out = _run(["fom", "--resolution", "1", "--k", "1", "1", "1", "1", "1"])
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert len(rec["qoi"]) == 5
    assert all(v > 0 for v in rec["qoi"])


def test_cli_rom_json():
    out = _run(["rom", "--resolution", "1", "--n-snapshots", "32", "--r", "10"])
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["rel_err_vs_fom"] < 0.05


def test_cli_bad_args():
    out = _run(["fom", "--k", "1", "2"])
    assert out.returncode != 0
    out = _run(["nonsense"])
    assert out.returncode != 0


def test_cli_invert_box_prior():
    """The reference's uniform-prior user story end-to-end from the CLI
    (SURVEY.md A.5; VERDICT r2 item 9): invert with a log-uniform box prior
    on k, tiny everything."""
    out = _run([
        "invert", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "120", "--burn", "40", "--noise", "1e-2",
        "--prior", "log_uniform", "--prior-low", "0.2", "--prior-high", "5.0",
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["prior"] == "log_uniform"
    # posterior mean reported in log k, inside the box
    import math

    for m in rec["posterior_mean_log_k"]:
        assert math.log(0.2) - 1e-6 <= m <= math.log(5.0) + 1e-6


def test_cli_evidence_json():
    """`evidence` runs SMC end-to-end on a tiny pipeline and reports a
    finite log Z with an error bar (the Bayes-factor leg of SURVEY.md
    Appendix C)."""
    out = _run([
        "evidence", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--particles", "512", "--groups", "4", "--mutations", "3",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    import math

    assert math.isfinite(rec["log_evidence"])
    assert rec["log_evidence_std"] >= 0
    assert len(rec["posterior_mean_log_k"]) == 5
    assert all(n <= 64 for n in rec["n_stages"])


def test_cli_sbc_json():
    """`sbc` runs the simulation-based-calibration oracle end-to-end on a
    tiny pipeline and reports per-parameter rank-uniformity p-values
    (SURVEY.md §4 posterior-quality oracles)."""
    out = _run([
        "sbc", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-1",
        "--datasets", "48", "--sbc-chains", "15", "--bins", "4",
        "--steps", "400", "--burn", "250",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert len(rec["p_values"]) == 5
    assert rec["n_posterior_draws"] == 15
    # a correctly-specified pipeline at easy noise must not be flagged
    assert rec["calibrated"] is True, rec
    assert len(rec["rank_counts"]) == 5 and len(rec["rank_counts"][0]) == 4


def test_cli_vi_json():
    """`vi` fits the ADVI posterior approximation end-to-end on a tiny
    pipeline: valid JSON, finite posterior moments, and an ELBO that
    improved over the run (infer/vi.py honest contract)."""
    out = _run([
        "vi", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--steps", "600", "--mc", "16",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["rank"] == "full"
    assert len(rec["posterior_mean_log_k"]) == 5
    assert all(s > 0 for s in rec["posterior_std_log_k"])
    assert rec["n_forward_evals"] == 600 * 16
    first, last = rec["elbo_first_last"]
    assert last > first
    assert rec["mean_abs_err"] < 1.0


def test_cli_svgd_json():
    """`svgd` transports the particle ensemble end-to-end on a tiny
    pipeline: valid JSON, finite posterior moments, and a data misfit that
    dropped over the transport (infer/svgd.py honest contract)."""
    out = _run([
        "svgd", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--particles", "64", "--steps", "300",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["n_particles"] == 64
    assert len(rec["posterior_mean_log_k"]) == 5
    assert all(s > 0 for s in rec["posterior_std_log_k"])
    assert rec["n_forward_evals"] == 300 * 64
    first, last = rec["misfit_first_last"]
    assert last < first
    assert rec["mean_abs_err"] < 1.0


def test_cli_vi_psis_gate():
    """`vi --psis K` appends the PSIS certification block: k-hat, the
    usability verdict, and the importance-corrected mean (a near-Gaussian
    1e-2-noise rom_nn posterior must pass the gate)."""
    out = _run([
        "vi", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--steps", "800", "--mc", "16", "--psis", "2048",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    psis = rec["psis"]
    assert psis["n_draws"] == 2048
    assert psis["reliable"] is True, psis
    assert psis["k_hat"] < 0.7
    assert 0 < psis["ess"] <= 2048
    assert len(psis["corrected_mean_log_k"]) == 5


def test_cli_vi_flow_neutra():
    """`vi --flow N`: the normalizing-flow branch (SMC pretrain -> MLE)
    with PSIS certification and a NeuTra exactness pass — the full
    approximation-to-exact ladder in one command (infer/flow.py)."""
    out = _run([
        "vi", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--mc", "16", "--flow", "4", "--psis", "1024", "--psis-widen",
        "1.1", "--neutra", "300",
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["family"].startswith("flow")
    assert rec["psis"]["base_scale"] == 1.1
    assert len(rec["posterior_mean_log_k"]) == 5
    assert rec["psis"]["reliable"] is True, rec["psis"]
    assert rec["neutra"]["rhat_split_max"] < 1.2
    # acceptance: adaptation targets 0.234 but a GOOD flow rails beta at 1
    # (near-independence proposals accept far above target — measured 0.71)
    assert 0.05 < rec["neutra"]["accept_rate"] <= 1.0
    assert rec["mean_abs_err"] < 1.0


def test_cli_select_ell_json():
    """`select-ell`: the evidence-based prior-hyperparameter sweep parses,
    runs the forward_only builds + per-candidate SMC evidence, and emits
    the pooled verdict (machinery smoke — identifiability needs pooled
    datasets, pinned in tests/test_ell_selection.py)."""
    out = _run([
        "select-ell", "--resolution", "1", "--n-features", "8",
        "--ells", "0.5", "2.0", "--ell-true", "1.0", "--noise", "1e-2",
        "--particles", "256", "--groups", "2", "--n-datasets", "2",
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["ells"] == [0.5, 2.0]
    assert len(rec["log_z"]) == 2 and all(
        isinstance(v, float) for v in rec["log_z"]
    )
    assert abs(sum(rec["posterior"]) - 1.0) < 1e-6
    assert rec["ell_map"] in rec["ells"]
    assert rec["n_datasets"] == 2


def test_cli_map_and_eki_psis_gates():
    """--psis on `map` and `eki`: the Laplace fit and the moment-matched
    ensemble Gaussian each get the k-hat verdict plus a cross-checkable
    log-evidence (all three CLI approximations share one certification)."""
    out = _run([
        "map", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--psis", "2048",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["psis"]["reliable"] is True, rec["psis"]
    lz_map = rec["psis"]["log_evidence"]

    out = _run([
        "eki", "--resolution", "1", "--n-snapshots", "32", "--r", "10",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--ensemble", "512", "--psis", "2048",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["psis"]["reliable"] is True, rec["psis"]
    assert 0 < rec["psis"]["ess"] <= 2048
    # the two commands invert DIFFERENT synthetic data draws, so evidences
    # need not match across commands — both must simply be finite
    import math

    assert math.isfinite(lz_map) and math.isfinite(rec["psis"]["log_evidence"])


def test_cli_infer_noise():
    """`invert --infer-noise` (unknown sigma, marginalized) reports the
    sigma posterior and the scale-free shape PPC; `map --infer-noise`
    reports the plug-in scale its Laplace intervals use."""
    out = _run([
        "invert", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "160", "--burn", "40", "--noise", "1e-2", "--infer-noise",
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    sp = rec["noise_sigma_post"]
    assert 0 < sp["sigma_q05"] < sp["sigma_q50"] < sp["sigma_q95"]
    assert 0.0 <= rec["ppc_p_value"] <= 1.0

    out = _run([
        "map", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--noise", "1e-2",
        "--infer-noise",
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert rec["noise_sigma_plugin"] > 0
    assert len(rec["theta_map"]) == 5


def test_cli_design():
    """`design` picks pointwise sensors with a monotone EIG trace and
    shrinking greedy gains (infer/oed.py)."""
    out = _run([
        "design", "--resolution", "1", "--dtype", "float64",
        "--sensors", "4", "--draws", "6",
    ])
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert len(rec["node_ids"]) == 4 and len(rec["xy"]) == 4
    tr = rec["eig_trace_nats"]
    assert all(b > a for a, b in zip(tr, tr[1:]))
    g = rec["gains_nats"]
    assert all(b <= a + 1e-9 for a, b in zip(g, g[1:]))
    assert rec["n_candidates"] > 20


def test_cli_design_invert_roundtrip(tmp_path):
    """`design --out` then `invert --sensors`: the designed pointwise
    observables flow through the whole pipeline from the CLI."""
    dz = str(tmp_path / "design.npz")
    out = _run([
        "design", "--resolution", "1", "--dtype", "float64",
        "--sensors", "6", "--draws", "6", "--out", dz,
    ])
    assert out.returncode == 0, out.stderr[-800:]
    out = _run([
        "invert", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "160", "--burn", "40", "--noise", "1e-2",
        "--sensors", dz,
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    assert len(rec["posterior_mean_log_k"]) == 5
    # resolution mismatch is refused with a clear message
    out = _run([
        "invert", "--resolution", "2", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "120", "--burn", "40", "--sensors", dz,
    ])
    assert out.returncode != 0
    assert "resolution" in (out.stderr + out.stdout)


def test_cli_predict(tmp_path):
    """`invert --predict-at --predict-out`: posterior-predictive temperature
    at uninstrumented points plus the saved field npz
    (api.predict_temperature; utils/predict.py)."""
    field_out = str(tmp_path / "pred.npz")
    out = _run([
        "invert", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "120", "--burn", "40", "--noise", "1e-2",
        "--predict-at", "0.1,2.3", "--predict-at=-2.5,0.875",
        "--predict-out", field_out,
    ], timeout=900)
    assert out.returncode == 0, out.stderr[-800:]
    rec = json.loads(out.stdout.strip().split("\n")[-1])
    rows = rec["predictions"]
    assert len(rows) == 2
    for row in rows:
        assert row["q05"] <= row["mean"] <= row["q95"]
        assert row["sd"] > 0
        # new-reading SD includes the 1e-2 noise floor in quadrature
        assert row["pred_sd"] >= max(row["sd"], 1e-2)
    import numpy as np

    z = np.load(field_out)
    assert z["mean"].shape == z["std"].shape == (z["node_xy"].shape[0],)
    # an out-of-domain point must fail loudly
    bad = _run([
        "invert", "--resolution", "1", "--n-snapshots", "24", "--r", "8",
        "--n-train", "64", "--epochs", "20", "--chains", "8",
        "--steps", "120", "--burn", "40", "--noise", "1e-2",
        "--predict-at", "2.0,1.5",
    ], timeout=900)
    assert bad.returncode != 0
    assert "outside" in bad.stderr
